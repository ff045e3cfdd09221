"""LPIPS weight conversion round-trip with synthetic official-shaped dicts."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS_DIR not in sys.path:
    sys.path.insert(0, SCRIPTS_DIR)

# official AlexNet conv shapes (out, in, kh, kw) at features indices 0,3,6,8,10
_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
           (256, 384, 3, 3), (256, 256, 3, 3)]
_IDX = (0, 3, 6, 8, 10)


def test_convert_and_load(tmp_path):
    import convert_lpips_weights as conv

    rng = np.random.default_rng(0)
    feats = {}
    for ti, shape in zip(_IDX, _SHAPES):
        feats[f"features.{ti}.weight"] = torch.from_numpy(
            rng.normal(size=shape).astype(np.float32))
        feats[f"features.{ti}.bias"] = torch.from_numpy(
            rng.normal(size=shape[0]).astype(np.float32))
    lins = {
        f"lin{i}.model.1.weight": torch.from_numpy(
            np.abs(rng.normal(size=(1, _SHAPES[i][0], 1, 1))).astype(np.float32))
        for i in range(5)
    }
    ap = tmp_path / "alexnet.pth"
    lp = tmp_path / "alex.pth"
    torch.save(feats, ap)
    torch.save(lins, lp)
    out = conv.convert(str(ap), str(lp), str(tmp_path / "lpips.npz"))

    # loading through the lpips module must produce a working metric
    from betavae_tpu.ops.lpips import build_lpips_fn
    import jax.numpy as jnp

    lpips = build_lpips_fn(out)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    assert float(lpips(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    assert float(lpips(x, y)) > 0
    # converted kernel really is HWIO of the torch OIHW
    flat = dict(np.load(out))
    w0 = feats["features.0.weight"].numpy()
    np.testing.assert_array_equal(flat["net/conv0/kernel"],
                                  np.transpose(w0, (2, 3, 1, 0)))
