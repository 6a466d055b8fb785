from f_lite_tpu.sampling.euler import DenoiseSettings, denoise, make_denoise_fn

__all__ = ["DenoiseSettings", "denoise", "make_denoise_fn"]
