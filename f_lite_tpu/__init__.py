"""f-lite-tpu: a TPU-native (JAX/XLA/Pallas/pjit) text-to-image framework
with the capabilities of F-Lite (sippycoder/f-lite).

Public API mirrors the reference package surface
(`/root/reference/f_lite/__init__.py`): FLitePipeline, FLitePipelineOutput,
APGConfig, DiT — plus the config/param-level JAX entry points.
"""

__version__ = "0.1.0"

__all__ = ["APGConfig"]


def __getattr__(name):
    # Lazy imports keep `import f_lite_tpu` light AND jax-free (pure-ops
    # users need no flax/model deps, and the data loader's forkserver
    # preloads f_lite_tpu.data.dataset through this __init__ — jax in
    # that server process would reintroduce the fork-with-threads hazard
    # the forkserver exists to avoid) while still exposing the reference
    # API surface.
    if name == "APGConfig":
        from f_lite_tpu.ops.guidance import APGConfig

        return APGConfig
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
