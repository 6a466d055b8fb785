"""f-lite-tpu: a TPU-native (JAX/XLA/Pallas/pjit) text-to-image framework
with the capabilities of F-Lite (sippycoder/f-lite).

Public API mirrors the reference package surface
(`/root/reference/f_lite/__init__.py`): FLitePipeline, FLitePipelineOutput,
APGConfig, DiT — plus the config/param-level JAX entry points.
"""

from f_lite_tpu.ops.guidance import APGConfig

__version__ = "0.1.0"

__all__ = ["APGConfig"]


def __getattr__(name):
    # Lazy imports keep `import f_lite_tpu` light (no flax/model deps needed
    # for pure-ops users) while still exposing the reference API surface.
    if name in ("DiT", "DiTConfig"):
        from f_lite_tpu.models.dit import DiT, DiTConfig

        return {"DiT": DiT, "DiTConfig": DiTConfig}[name]
    if name in ("FLitePipeline", "FLitePipelineOutput"):
        from f_lite_tpu.pipeline import FLitePipeline, FLitePipelineOutput

        return {
            "FLitePipeline": FLitePipeline,
            "FLitePipelineOutput": FLitePipelineOutput,
        }[name]
    raise AttributeError(name)
