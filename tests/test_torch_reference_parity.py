"""THE BASELINE gate: allclose against the actual reference renderer.

Runs only when the reference repo is mounted (skipped otherwise): imports
torch_renderer.py from /root/reference/python and compares images, aux
outputs, and gradients of our renderer (both impls) against the real
PyTorch implementation — not a re-derivation of it.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_PY = Path("/root/reference/python")

torch = pytest.importorskip("torch")
if not REFERENCE_PY.exists():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, str(REFERENCE_PY))

import torch_renderer as ref  # noqa: E402  (the reference implementation)

from tpu_gaussians.core import camera as cam  # noqa: E402
from tpu_gaussians.core.types import RenderConfig, make_gaussians  # noqa: E402
from tpu_gaussians.ops.dispatch import render  # noqa: E402

from .utils import random_scene  # noqa: E402

W, H = 48, 40


def _torch_camera(index=0, views=4):
    c = cam.orbit_cameras(views, W, H)[index]
    return ref.Camera(
        view=torch.from_numpy(np.asarray(c.view)),
        proj=torch.from_numpy(np.asarray(c.proj)),
    ), c


@pytest.mark.parametrize("use_sh", [False, True])
@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_image_and_aux_match_torch(use_sh, impl):
    g = random_scene(41, seed=11, use_sh=use_sh)
    tcam, jcam = _torch_camera(index=1)

    colors = np.asarray(g.sh if g.use_sh else g.colors)
    t_img, t_alpha, t_depth = ref.render_gaussians_torch(
        torch.from_numpy(np.asarray(g.means)),
        torch.from_numpy(np.asarray(g.scales)),
        torch.from_numpy(colors),
        torch.from_numpy(np.asarray(g.opacities)),
        tcam, width=W, height=H,
        background=torch.tensor([0.1, 0.2, 0.3]),
        return_aux=True,
    )

    cfg = RenderConfig(width=W, height=H, impl=impl, return_aux=True,
                       background=(0.1, 0.2, 0.3), chunk_size=16)
    image, alpha, depth = render(g, jcam, cfg)

    np.testing.assert_allclose(np.asarray(image), t_img.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), t_alpha.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), t_depth.numpy(),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_gradients_match_torch_autograd(impl):
    """dL/d{means, scales, colors, opacities} vs torch autograd through
    the reference renderer (SURVEY.md §3.5 — the gradient path the fused
    VJP must match)."""
    import jax
    import jax.numpy as jnp

    g = random_scene(17, seed=23)
    tcam, jcam = _torch_camera(index=2)
    target = np.random.default_rng(0).uniform(
        size=(H, W, 3)).astype(np.float32)

    # --- torch side ---
    t_args = [torch.from_numpy(np.asarray(a)).requires_grad_(True)
              for a in (g.means, g.scales, g.colors, g.opacities)]
    t_img = ref.render_gaussians_torch(
        *t_args, tcam, width=W, height=H,
        background=torch.tensor([0.0, 0.0, 0.0]),
    )
    t_loss = torch.mean(torch.abs(t_img - torch.from_numpy(target)))
    t_loss.backward()
    t_grads = [a.grad.numpy() for a in t_args]

    # --- jax side ---
    cfg = RenderConfig(width=W, height=H, impl=impl, chunk_size=16)

    def loss(means, scales, colors, opacities):
        gg = g.replace(means=means, scales=scales, colors=colors,
                       opacities=opacities)
        img = render(gg, jcam, cfg)
        return jnp.mean(jnp.abs(img - target))

    j_grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        g.means, g.scales, g.colors, g.opacities)

    names = ["means", "scales", "colors", "opacities"]
    for name, tg, jg in zip(names, t_grads, j_grads):
        np.testing.assert_allclose(
            np.asarray(jg), tg, atol=5e-6, rtol=5e-4,
            err_msg=f"gradient mismatch vs torch for {name}",
        )
