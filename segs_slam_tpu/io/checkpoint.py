"""Checkpoint / resume.

The reference only saves at shutdown (PLY + plain-text MLP dumps +
cameras.json, no optimizer state, no resume — SURVEY §5.4; reference:
GaussianModel::save_mlp_checkpoints src/gaussian_model.cpp:1262-1317,
GaussianMapper::savePly :2127-2226). Here:

  * full mid-training resume: the entire TrainState (anchors + decoders +
    Adam moments + densify stats + step) via orbax;
  * ecosystem artifacts for parity: anchor PLY (io/ply.py), plain-text MLP
    weight dumps in the reference's layout, and a cameras.json compatible
    with 3DGS viewers.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax


def _pad_empty(x):
    """Orbax refuses zero-size arrays (e.g. the (0, 6) pose table when pose
    optimization is off); stand in a minimal non-empty placeholder."""
    a = np.asarray(x)
    if a.size == 0:
        return np.zeros(tuple(max(1, s) for s in a.shape), a.dtype)
    return a


def save_train_state(path: str | Path, state) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(_pad_empty, state))
    ckptr.wait_until_finished()


def load_train_state(path: str | Path, template):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.tree.map(_pad_empty, template))

    def unpad(r, t):
        t = np.asarray(t)
        return np.zeros(t.shape, t.dtype) if t.size == 0 else r

    return jax.tree.map(unpad, restored, template)


def save_mlp_checkpoints_txt(out_dir: str | Path, decoders: dict) -> None:
    """Plain-text W/b dumps per layer, mirroring save_mlp_checkpoints
    (reference: src/gaussian_model.cpp:1262-1317): one file per tensor,
    5-decimal fixed-point rows."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def dump(name: str, arr: np.ndarray) -> None:
        a = np.asarray(arr)
        if a.ndim == 1:
            a = a[None, :]
        with open(out_dir / f"{name}.txt", "w") as f:
            for row in a:
                f.write(" ".join(f"{v:.5f}" for v in row) + "\n")

    for mlp_name, layers in decoders.items():
        if mlp_name == "embedding":
            dump("embedding_appearance", layers["table"])
            continue
        if "w" in layers:  # single linear (appearance)
            dump(f"mlp_{mlp_name}_weight", layers["w"].T)
            dump(f"mlp_{mlp_name}_bias", layers["b"])
            continue
        for lname, lin in layers.items():
            dump(f"mlp_{mlp_name}_{lname}_weight", lin["w"].T)
            dump(f"mlp_{mlp_name}_{lname}_bias", lin["b"])


def save_cameras_json(path: str | Path, keyframes: dict) -> None:
    """3DGS-viewer-compatible cameras.json
    (reference: GaussianMapper::saveModelParams/keyframesToJson,
    src/gaussian_mapper.cpp:2147-2226)."""
    entries = []
    for i, (kid, kf) in enumerate(sorted(keyframes.items())):
        R = kf.rotation_matrix()
        C2W_R = R.T
        center = -R.T @ kf.trans
        entries.append(
            {
                "id": int(i),
                "img_name": str(kid),
                "width": kf.camera.width,
                "height": kf.camera.height,
                "position": [float(x) for x in center],
                "rotation": [[float(x) for x in row] for row in C2W_R],
                "fx": float(kf.camera.fx),
                "fy": float(kf.camera.fy),
            }
        )
    with open(path, "w") as f:
        json.dump(entries, f)


def save_cfg_args(path: str | Path, model_config, white_background: bool,
                  source_path: str = "") -> None:
    """The namespace-string cfg_args file 3DGS tooling expects
    (reference: src/gaussian_mapper.cpp:2228-2246)."""
    text = (
        "Namespace(eval=False, images='images', model_path='"
        + str(Path(path).parent)
        + f"', n_offsets={model_config.n_offsets}, feat_dim={model_config.feat_dim}"
        + f", resolution=-1, sh_degree=3, source_path='{source_path}'"
        + f", white_background={white_background})"
    )
    Path(path).write_text(text)
