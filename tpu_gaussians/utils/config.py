"""The framework's config tree: every reference CLI flag, name and default
preserved verbatim (fit_multiview_stub.py:201-229), plus TPU-specific knobs
(impl, capacity behavior, sharding, checkpointing)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass
class FitConfig:
    # Data / paths (fit_multiview_stub.py:202-206)
    targets_dir: str = ""
    out_dir: str = "outputs/fit_multiview"
    camera_npz: str = ""
    masks_dir: str = ""
    depth_dir: str = ""

    # Optimization (:208-213)
    iters: int = 300
    lr: float = 0.02
    width: int = 128
    height: int = 128
    num_gaussians: int = 800
    max_gaussians: int = 3000

    # Appearance (:215)
    use_sh: bool = False
    sh_degree: int = 1  # 1 = reference SH convention; 2/3 = 3DGS real SH
                        # (TPU-native extension, ops/sh.py)

    # Densify / prune (:217-220)
    densify_interval: int = 80
    prune_interval: int = 80
    densify_ratio: float = 0.15
    prune_opacity: float = 0.05

    # Loss stack (:222-227)
    silhouette_weight: float = 0.2
    mask_thresh: float = 0.06
    depth_weight: float = 0.05
    reg_opacity: float = 0.001
    reg_scale: float = 0.001
    ssim_weight: float = 0.0  # 3DGS-style D-SSIM term (extension; 0 = ref)

    # --- TPU-native extensions (no reference counterpart) ---
    seed: int = 0
    impl: str = "auto"            # renderer impl: auto | jnp | pallas
    footprint: str = "axis"       # axis (reference parity) | ewa (quat+cov)
    render_mode: str = "accum"    # accum (reference training semantics) |
                                  # sorted (3DGS-style depth-sorted alpha
                                  # blending via the fused Pallas VJP)
    accum_binned: str = "auto"    # accum kernel choice: auto (tile-binned
                                  # lists above 32k gaussians) | on | off
    clone_metric: str = "opacity"  # densify ranking: opacity (reference) | grad
    split_scale_thresh: float = 0.0  # 3DGS split: cloned gaussians whose max
                                     # world scale exceeds this are SPLIT
                                     # (parent+child shrunk by split_shrink,
                                     # child keeps opacity); 0 = off (ref)
    split_shrink: float = 1.6        # 3DGS split scale divisor
    opacity_reset_interval: int = 0  # 3DGS: clamp opacities to <= reset value
                                     # every N iters (fights floaters);
                                     # 0 = off (reference behavior)
    opacity_reset_value: float = 0.01
    init_npz: str = ""               # warm-start from an exported npz
                                     # (e.g. import_colmap --init_out, or a
                                     # previous fit); overrides random init
    means_lr_final: float = 1.0      # final means-lr multiplier, decayed
                                     # exponentially over iters (3DGS uses
                                     # ~0.01); 1.0 = constant lr (reference)
    log_every: int = 25            # print cadence (reference prints every 25, :315)
    checkpoint_every: int = 0      # 0 = only final artifacts (reference behavior)
    resume: bool = False           # resume from latest checkpoint in out_dir
    num_view_shards: int = 1       # views axis sharding over the device mesh
    metrics_jsonl: bool = True     # structured per-step metrics to metrics.jsonl

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "FitConfig":
        return FitConfig(**json.loads(text))
