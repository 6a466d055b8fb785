"""Chat-template message construction for chat-style text encoders.

Reference wraps captions in a Qwen2.5-VL chat template with a fixed system
prompt before encoding — a different prompt at inference
(`/root/reference/f_lite/pipeline.py:105-124`) vs training, where the
system prompt is conditioned on the sample's media_type metadata
(`/root/reference/f_lite/train.py:283-305`). Kept encoder-agnostic: these
functions build the message list; the encoder's tokenizer applies its own
chat template. T5-era encoders ignore templates and consume raw captions.
"""

from __future__ import annotations

INFERENCE_SYSTEM_PROMPT = (
    "You are a text-to-image generation model engineered to transform "
    "user-provided textual captions directly into high-quality, visually "
    "rich image tokens. Your core objective is to generate the best "
    "possible, highest-fidelity image that creatively interprets and "
    "expands upon the user's intent while maintaining strong semantic "
    "alignment with the original caption. You are designed for maximum "
    "visual quality, artistic flair, and implicit adherence to best "
    "practices in image generation (e.g., proper anatomy, clear focus, "
    "compelling composition), ensuring a stunning visual result from even "
    "concise descriptions."
)

TRAIN_SYSTEM_PROMPT_REAL = (
    "You are an assistant designed to generate high-quality images based "
    "on user prompts. Generate images that are realistic and high-quality."
)

TRAIN_SYSTEM_PROMPT_NONREAL = (
    "You are an assistant designed to generate high-quality images based "
    "on user prompts. The image doesn't need to be realistic, but it "
    "should be high-quality."
)


def inference_chat_messages(caption: str) -> list[dict]:
    """Message list for inference encoding (`pipeline.py:105-124`)."""
    return [
        {"role": "system", "content": INFERENCE_SYSTEM_PROMPT},
        {"role": "user", "content": [{"type": "text", "text": caption}]},
    ]


def training_chat_messages(caption: str, metadata: dict | None = None) -> list[dict]:
    """Message list for training encoding; system prompt depends on
    media_type metadata (`train.py:283-305`)."""
    media_type = (metadata or {}).get("media_type", "real")
    system = (
        TRAIN_SYSTEM_PROMPT_REAL
        if media_type == "real"
        else TRAIN_SYSTEM_PROMPT_NONREAL
    )
    return [
        {"role": "system", "content": system},
        {
            "role": "user",
            "content": [{"type": "text", "text": f"Caption: \n\n{caption}"}],
        },
    ]
