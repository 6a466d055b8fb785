from f_lite_tpu.convert.jax_to_torch import (
    invert_dit_params,
    invert_vae_params,
)
from f_lite_tpu.convert.lora_torch import (
    lora_from_peft_state_dict,
    lora_to_peft_state_dict,
)
from f_lite_tpu.convert.torch_to_jax import (
    convert_dit_state_dict,
    convert_vae_state_dict,
    load_torch_state_dict,
)

__all__ = [
    "convert_dit_state_dict",
    "convert_vae_state_dict",
    "invert_dit_params",
    "invert_vae_params",
    "load_torch_state_dict",
    "lora_from_peft_state_dict",
    "lora_to_peft_state_dict",
]
