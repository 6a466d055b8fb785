from f_lite_tpu.utils.image import make_image_grid, to_pil_images

__all__ = ["make_image_grid", "to_pil_images"]
