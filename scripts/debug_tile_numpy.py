"""NumPy transcription of the blend backward for one tile: find the exact
operation that produces inf/NaN (runs on CPU jax for binning parity)."""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from segs_slam_tpu.ops.rasterizer import RasterConfig  # noqa: E402
from segs_slam_tpu.ops.rasterizer.binning import (  # noqa: E402
    compact_gaussians,
    expand_and_sort,
)

rc = RasterConfig(tile=16, compact=131072, kmax=16, chunk=256)
W, H = 640, 480
tx, ty = rc.grid(W, H)

d = np.load("/tmp/blend_inputs.npz")
names = ["mx", "my", "ca", "cb", "cc", "op", "r", "g", "b"]
feats = tuple(jnp.asarray(d[n]) for n in names)
aux = {k: jnp.asarray(d[k]) for k in
       ["rect_min_x", "rect_min_y", "rect_w", "touched", "depth", "alive"]}
bad_rows = np.load("/tmp/bad_rows.npy")

cg = compact_gaussians(feats, aux, rc)
binned = expand_and_sort(cg, tx, ty, rc)
print("num_valid:", int(cg.num_valid), flush=True)

orig = np.asarray(cg.orig_id)
# compact index of the example bad gaussian
bad_set = set(bad_rows.tolist())
bad_compact = np.where(np.isin(orig, bad_rows))[0]
print("bad gaussians in compact buffer:", len(bad_compact), flush=True)

gid = np.asarray(binned.gid_sorted)
tile_of_instance = None
# reconstruct each instance's tile from the sorted order + ranges
start = np.asarray(binned.tile_start)
stop = np.asarray(binned.tile_stop)
fs = [np.asarray(f) for f in binned.feats_sorted]

# scan ALL tiles containing bad gaussians
bad_mask_c = np.zeros(len(gid), bool)
bad_mask_c = np.isin(gid, bad_compact)
cand_tiles = [t for t in range(tx * ty)
              if bad_mask_c[start[t]:stop[t]].any()]
print("candidate tiles:", len(cand_tiles), flush=True)


def run_tile(target_tile, quiet=True):
    lo, hi = int(start[target_tile]), int(stop[target_tile])
    n = hi - lo
    tile_y, tile_x = divmod(target_tile, tx)
    oxv, oyv = tile_x * 16.0, tile_y * 16.0
    P = 256
    pxy = np.arange(P)
    px = (pxy % 16).astype(np.float32)
    py = (pxy // 16).astype(np.float32)

    MX, MY, CA, CB, CC, OP, R, G, B, DEP = [f[lo:hi] for f in fs]
    x = MX - oxv
    y = MY - oyv

    # forward per-pixel alpha matrix [P, n] in f32 (the kernel's quadratic form)
    dx = px[:, None] - x[None, :]
    dy = py[:, None] - y[None, :]
    power = (-0.5 * (CA[None] * dx * dx + CC[None] * dy * dy)
             - CB[None] * dx * dy).astype(np.float32)
    opg = (OP[None] * np.exp(power)).astype(np.float32)
    alpha = np.minimum(0.99, opg)
    ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
    alpha = np.where(ok, alpha, 0.0).astype(np.float32)

    # forward accept with transmittance threshold, chunked like the kernel
    ch = rc.chunk
    nchunks = (n + ch - 1) // ch
    T = np.ones(P, np.float32)
    ncontrib = np.zeros(P, np.int32)
    for ci in range(nchunks):
        a = alpha[:, ci * ch:(ci + 1) * ch]
        om = (1.0 - a).astype(np.float32)
        lg = np.log(om.astype(np.float32)).astype(np.float32)
        cum = np.exp(np.cumsum(lg, axis=1)).astype(np.float32)  # kernel log-scan
        test_t = T[:, None] * cum
        accept = test_t >= rc.transmittance_min
        idx1 = np.arange(a.shape[1])[None] + ci * ch + 1
        ncontrib = np.maximum(ncontrib,
                              np.where(accept & (a > 0), idx1, 0).max(axis=1))
        T = np.where(accept, test_t, T[:, None]).min(axis=1).astype(np.float32)
    final_t = T
    print("final_t min/max:", final_t.min(), final_t.max(), flush=True)
    print("ncontrib max:", ncontrib.max(), flush=True)

    # backward, chunked back-to-front (kernel formulas, f32)
    dldc = np.random.default_rng(0).normal(size=(3, P)).astype(np.float32) * 0.01
    COL = np.stack([R, G, B], 0)
    T_end = final_t.copy()
    S = (final_t * (0.0)).astype(np.float32)  # bg black -> bg_dot = 0
    first_bad = None
    for step_i in range(nchunks):
        ci = nchunks - 1 - step_i
        sl = slice(ci * ch, min((ci + 1) * ch, n))
        a = alpha[:, sl].copy()
        idx = np.arange(sl.start, sl.stop)[None]
        m = idx < ncontrib[:, None]
        a = np.where(m, a, 0.0).astype(np.float32)
        og = np.where(m, np.where(ok[:, sl], opg[:, sl], 0), 0).astype(np.float32)
        om = (1.0 - a).astype(np.float32)
        lg = np.log(om).astype(np.float32)
        # suffix product via log matmul (the kernel's _suffix_prod_lane)
        sfx = np.cumsum(lg[:, ::-1], axis=1)[:, ::-1].astype(np.float32)
        sp = np.exp(sfx).astype(np.float32)
        t_before = (T_end[:, None] / sp).astype(np.float32)
        g = (dldc.T @ COL[:, sl]).astype(np.float32)
        w = (a * t_before).astype(np.float32)
        wg = (w * g).astype(np.float32)
        suf = np.cumsum(wg[:, ::-1], axis=1)[:, ::-1].astype(np.float32)
        s_i = ((suf - wg) + S[:, None]).astype(np.float32)
        dalpha = np.where(a > 0, t_before * g - s_i / om, 0.0).astype(np.float32)
        dpower = (og * dalpha).astype(np.float32)
        for nm, arr in [("sp", sp), ("t_before", t_before), ("w", w),
                        ("dalpha", dalpha), ("dpower", dpower)]:
            badm = ~np.isfinite(arr)
            if badm.any() and first_bad is None:
                first_bad = (ci, nm)
                pi, ii = np.argwhere(badm)[0]
                print(f"FIRST NONFINITE: chunk {ci} tensor {nm} "
                      f"pixel {pi} inst {ii}", flush=True)
                print(f"  T_end={T_end[pi]:.6g} sp={sp[pi, ii]:.6g} "
                      f"alpha={a[pi, ii]:.6g} om={om[pi, ii]:.6g} "
                      f"ncontrib={ncontrib[pi]}", flush=True)
                print(f"  chunk alpha stack (pixel {pi}): "
                      f"{np.sort(a[pi])[-12:]}", flush=True)
                print(f"  accepted in chunk: {(a[pi] > 0).sum()}", flush=True)
        T_end = np.minimum(T_end / sp[:, 0], 1.0).astype(np.float32)
        S = (S + wg.sum(axis=1)).astype(np.float32)
    return first_bad


hits = 0
for t in cand_tiles:
    fb = run_tile(t)
    if fb is not None:
        hits += 1
        print(f"tile {t}: NONFINITE at {fb}", flush=True)
        if hits >= 3:
            break
print("scan complete; tiles with nonfinite:", hits, flush=True)
