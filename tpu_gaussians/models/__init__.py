from tpu_gaussians.models.gaussian_model import RawParams, activate, init_params

__all__ = ["RawParams", "activate", "init_params"]
