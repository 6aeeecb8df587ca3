from tpu_gaussians.core.types import Camera, Gaussians, RenderConfig

__all__ = ["Camera", "Gaussians", "RenderConfig"]
