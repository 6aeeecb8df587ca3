from tpu_gaussians.ops.dispatch import render

__all__ = ["render"]
