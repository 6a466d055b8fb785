from f_lite_tpu.models.dit import DiT, DiTConfig

__all__ = ["DiT", "DiTConfig"]
