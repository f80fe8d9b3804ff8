"""Bisect the real compact/expand cost: pack prologue vs sort vs expansion
broadcasts vs unpack epilogue, with varied pipelined inputs."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.ops.rasterizer.binning import (
    DEPTH_KEY_BITS,
    _depth_key,
    _pack2f16,
    _unpack2f16,
)

N = 655360
NC = 131072
KS = 4
TX, TY = 40, 30


def bench_varied(fn, args_list, name=""):
    outs = [fn(*args_list[0]), fn(*args_list[1])]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list) * 1000
    print(f"{name:36s}: {dt:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    nv = 24
    fs = [tuple(jnp.asarray(rng.normal(size=N).astype(np.float32))
                for _ in range(9)) for _ in range(nv)]
    jax.block_until_ready(fs)

    @jax.jit
    def pack_only(feats):
        x, y, ca, cb, cc, op, r, g, b = feats
        return (_pack2f16(x, y), _pack2f16(ca, cb), _pack2f16(cc, op),
                _pack2f16(r, g), _pack2f16(b, jnp.zeros_like(b)))

    bench_varied(pack_only, [(f,) for f in fs], name="pack2f16 x5 on [N]")

    @jax.jit
    def pack_bf16(feats):
        x, y, ca, cb, cc, op, r, g, b = feats

        def pk(a, b_):
            au = lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
            bu = lax.bitcast_convert_type(b_.astype(jnp.bfloat16), jnp.uint16)
            return au.astype(jnp.uint32) | (bu.astype(jnp.uint32) << 16)

        return (pk(x, y), pk(ca, cb), pk(cc, op), pk(r, g),
                pk(b, jnp.zeros_like(b)))

    bench_varied(pack_bf16, [(f,) for f in fs], name="pack bf16 x5 on [N]")

    packed = [pack_only(f) for f in fs]
    keys = [jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64),
                        jnp.uint32) for _ in range(nv)]
    jax.block_until_ready((packed, keys))

    @jax.jit
    def sort8(key, cols):
        return lax.sort((key,) + cols + (cols[0], cols[1], cols[2]),
                        num_keys=1, is_stable=True)

    bench_varied(sort8, list(zip(keys, packed)), name="sort key+8 cols")

    # expansion broadcasts: [NC, KS] narrow-minor intermediates
    pc_cols = [tuple(c[:NC] for c in p) for p in packed]
    rects = [jnp.asarray(rng.integers(0, 1 << 22, NC, dtype=np.int64),
                         jnp.uint32) for _ in range(nv)]
    dmetas = [jnp.asarray(rng.integers(0, 1 << 26, NC, dtype=np.int64),
                          jnp.uint32) for _ in range(nv)]
    jax.block_until_ready((pc_cols, rects, dmetas))
    num_tiles = TX * TY

    @jax.jit
    def expand_only(cols, rects, dmeta):
        p_xy = cols[0]
        rmx = (rects & 0xFF).astype(jnp.int32)
        rmy = ((rects >> 8) & 0xFF).astype(jnp.int32)
        rw_ = ((rects >> 16) & 0xFF).astype(jnp.int32)
        touched = (dmeta >> DEPTH_KEY_BITS).astype(jnp.int32)
        dkey = dmeta & ((1 << DEPTH_KEY_BITS) - 1)
        k = lax.broadcasted_iota(jnp.int32, (NC, KS), 1)
        ok = k < touched[:, None]
        rw = jnp.maximum(rw_, 1)[:, None]
        dy = k // rw
        dx = k - dy * rw
        tile_x = rmx[:, None] + dx
        tile_y = rmy[:, None] + dy
        tile = jnp.where(ok, tile_y * TX + tile_x,
                         num_tiles).astype(jnp.uint32)
        ukey = ((tile << DEPTH_KEY_BITS)
                | jnp.broadcast_to(dkey[:, None], (NC, KS))).reshape(-1)
        xr, yr = _unpack2f16(p_xy)
        xi = xr[:, None] - dx.astype(jnp.float32) * 16.0
        yi = yr[:, None] - dy.astype(jnp.float32) * 16.0
        p_xy_i = _pack2f16(xi.reshape(-1), yi.reshape(-1))

        def bcast(c):
            return jnp.broadcast_to(c[:, None], (NC, KS)).reshape(-1)

        return ukey, p_xy_i, bcast(cols[1]), bcast(cols[2]), bcast(cols[3])

    bench_varied(expand_only, list(zip(pc_cols, rects, dmetas)),
                 name="expand broadcasts [NC,4]->flat")

    # flat-index variant: compute everything on [NC*KS] 1-D arrays
    @jax.jit
    def expand_flat(cols, rects, dmeta):
        p_xy = cols[0]
        M = NC * KS
        gi = lax.iota(jnp.int32, M) // KS  # gaussian index per slot
        k = lax.iota(jnp.int32, M) % KS

        def take(c):  # broadcast-gather by construction: c[gi]
            return jnp.repeat(c, KS)

        rects_f = take(rects)
        dmeta_f = take(dmeta)
        rmx = (rects_f & 0xFF).astype(jnp.int32)
        rmy = ((rects_f >> 8) & 0xFF).astype(jnp.int32)
        rw_ = ((rects_f >> 16) & 0xFF).astype(jnp.int32)
        touched = (dmeta_f >> DEPTH_KEY_BITS).astype(jnp.int32)
        dkey = dmeta_f & ((1 << DEPTH_KEY_BITS) - 1)
        ok = k < touched
        rw = jnp.maximum(rw_, 1)
        dy = k // rw
        dx = k - dy * rw
        tile = jnp.where(ok, (rmy + dy) * TX + rmx + dx,
                         num_tiles).astype(jnp.uint32)
        ukey = (tile << DEPTH_KEY_BITS) | dkey
        xr, yr = _unpack2f16(take(p_xy))
        xi = xr - dx.astype(jnp.float32) * 16.0
        yi = yr - dy.astype(jnp.float32) * 16.0
        p_xy_i = _pack2f16(xi, yi)
        return ukey, p_xy_i, take(cols[1]), take(cols[2]), take(cols[3])

    bench_varied(expand_flat, list(zip(pc_cols, rects, dmetas)),
                 name="expand flat 1-D (repeat)")

    # unpack epilogue on [NK]
    NK = NC * KS + 8192 * 12
    insts = [tuple(jnp.asarray(rng.integers(0, 1 << 31, NK,
                                            dtype=np.int64), jnp.uint32)
                   for _ in range(6)) for _ in range(nv)]
    jax.block_until_ready(insts)

    @jax.jit
    def unpack_epilogue(cols):
        ukey = cols[0]
        tile_sorted = (ukey >> DEPTH_KEY_BITS).astype(jnp.int32)
        tile_c = jnp.minimum(tile_sorted, num_tiles - 1)
        ty_i = tile_c // TX
        tx_i = tile_c - ty_i * TX
        xr, yr = _unpack2f16(cols[1])
        x = xr + tx_i.astype(jnp.float32) * 16.0
        y = yr + ty_i.astype(jnp.float32) * 16.0
        ca, cb = _unpack2f16(cols[2])
        cc, op = _unpack2f16(cols[3])
        r, g = _unpack2f16(cols[4])
        b, _ = _unpack2f16(cols[5])
        tiles = jnp.arange(num_tiles, dtype=jnp.int32)
        st = jnp.searchsorted(tile_sorted, tiles, side="left")
        sp = jnp.searchsorted(tile_sorted, tiles, side="right")
        return x, y, ca, cb, cc, op, r, g, b, st, sp

    bench_varied(unpack_epilogue, [(i,) for i in insts],
                 name="unpack epilogue + searchsorted")

    # stack into [16, NK+chunk]
    @jax.jit
    def stack16(cols):
        xs = [lax.bitcast_convert_type(c, jnp.float32) for c in cols]
        xs = xs + [jnp.zeros(NK, jnp.float32)] * (16 - len(xs))
        stacked = jnp.stack(xs, axis=0)
        return jnp.concatenate(
            [stacked, jnp.zeros((16, 256), jnp.float32)], axis=1)

    bench_varied(stack16, [(i,) for i in insts], name="stack [16, NK]")


if __name__ == "__main__":
    main()
