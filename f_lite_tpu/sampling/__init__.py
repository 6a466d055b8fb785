from f_lite_tpu.sampling.euler import (
    DenoiseSettings,
    denoise,
    make_denoise_fn,
    schedule_start_time,
)

__all__ = [
    "DenoiseSettings",
    "denoise",
    "make_denoise_fn",
    "schedule_start_time",
]
