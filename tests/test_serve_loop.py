"""Smoke tests for the render server's measurement loop (cli.serve
--loop, r4) and the /info payload fields — CPU (jnp impl), tiny scene."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    from tpu_gaussians.core.types import make_gaussians
    from tpu_gaussians.io.npz import save_gaussians_npz

    rng = np.random.default_rng(0)
    n = 50
    g = make_gaussians(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32),
        rng.uniform(0.2, 0.9, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
    )
    path = tmp_path_factory.mktemp("serve") / "tiny.npz"
    save_gaussians_npz(path, g)
    return str(path)


def test_run_loop_prints_json(tiny_npz, capsys):
    from tpu_gaussians.cli.serve import RenderService, run_loop

    svc = RenderService(tiny_npz, impl="jnp", fovy=60.0,
                        preset="interactive")
    run_loop(svc, frames=3, width=64, height=48, mode="accum", fmt="raw")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(out)
    assert data["frames"] == 3
    assert data["n_gaussians"] == 50
    assert data["sustained_fps_this_host"] > 0
    assert data["preset"] == "interactive"
    # Device trace may be unavailable off-TPU; field must still exist.
    assert "device_ms_per_frame" in data
    assert "colocated_fps_bound" in data


def test_render_frame_shapes(tiny_npz):
    from tpu_gaussians.cli.serve import RenderService, encode_frame

    svc = RenderService(tiny_npz, impl="jnp", fovy=60.0, preset="quality")
    img = svc.render_frame(0.3, 0.1, 2.5, 64, 48, "accum")
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    raw, ctype = encode_frame(img, "raw")
    assert len(raw) == 48 * 64 * 4
    assert ctype == "application/octet-stream"
