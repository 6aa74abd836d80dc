"""Multimodal chat-prompt builder (reference:
vllm/entrypoints/openai/make_prompt.py — the fork's InternLM-XComposer2
serving glue).

Extracts base64 images from either TGI image markdown
(``![alt](data:image/png;base64,...)``) or OpenAI ``image_url`` content
parts, replaces them with a marker string, and applies the XComposer2
chat template. The decoded images are returned for the engine-side
``ImageEncoder`` (engine/image_encoder.py); ``splice_images`` then
expands the marker tokens into embedding spans.
"""
from __future__ import annotations

import re
from base64 import b64decode
from typing import Any, Dict, List, Tuple

import numpy as np

DEFAULT_SYSTEM_PROMPT = (
    "You are a helpful, respectful and honest assistant. Always answer "
    "as helpfully as possible, while being safe. Your answers should "
    "not include any harmful, unethical, racist, sexist, toxic, "
    "dangerous, or illegal content. Please ensure that your responses "
    "are socially unbiased and positive in nature.\n\nIf a question "
    "does not make any sense, or is not factually coherent, explain "
    "why instead of answering something not correct. If you don't know "
    "the answer to a question, please don't share false information.")

INTERNLM_XCOMPOSER2_TEMPLATE = (
    "{% for message in messages %}"
    "{{'[UNUSED_TOKEN_146]' + message['role'] + '\n' +"
    " message['content'] + '[UNUSED_TOKEN_145]' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '[UNUSED_TOKEN_146]assistant\n' }}"
    "{% endif %}")

IMAGE_MARKER = "[[IMAGE_GOES_HERE]]"

RE_TGI_IMAGE_MARKDOWN = re.compile(
    r'!\[([^\]]*)]\(data:([^;]*);base64,([-A-Za-z0-9+/]*={0,3})\)')
RE_OPENAI_IMAGE_URL = re.compile(
    r'data:([^;]*);base64,([-A-Za-z0-9+/]*={0,3})')


def _decode_image(mime_type: str, base64_string: str) -> np.ndarray:
    """base64 -> [H, W, 3] uint8 (PIL when available; raw bitmaps are
    out of scope without it)."""
    if not mime_type.startswith("image/"):
        raise ValueError(f"Unsupported mime type: {mime_type}")
    raw = b64decode(base64_string, validate=True)
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is in the image
        raise ValueError("image inputs need pillow installed") from e
    img = Image.open(BytesIO(raw)).convert("RGB")
    if img.size == (16, 16):
        raise ValueError("Image size is not supported")
    return np.asarray(img, np.uint8)


def make_prompt(request: Any, tokenizer: Any
                ) -> Tuple[str, List[np.ndarray]]:
    """Returns (templated prompt with image markers, decoded images)."""
    images: List[np.ndarray] = []

    def replace(mime_type: str, b64: str) -> str:
        images.append(_decode_image(mime_type, b64))
        return IMAGE_MARKER

    messages: List[Dict[str, Any]] = []
    for idx, msg in enumerate(request.messages):
        msg = dict(msg)
        if msg["role"] == "system" and msg["content"] == "":
            msg["content"] = DEFAULT_SYSTEM_PROMPT
        content = msg["content"]
        if isinstance(content, str):
            msg["content"] = RE_TGI_IMAGE_MARKDOWN.sub(
                lambda m: replace(m.group(2), m.group(3)), content)
        else:
            parts = []
            for c in content:
                if c["type"] == "text":
                    parts.append(c["text"])
                elif c["type"] == "image_url":
                    if idx == 0 and msg["role"] == "system":
                        raise ValueError("Image in the first system "
                                         "message is not supported")
                    url = c["image_url"]["url"]
                    m = RE_OPENAI_IMAGE_URL.match(url)
                    if not m:
                        raise ValueError("Invalid image.")
                    parts.append(replace(m.group(1), m.group(2)))
                else:
                    raise ValueError(
                        f"Unsupported content type: {c['type']}")
            msg["content"] = " ".join(parts)
        messages.append(msg)

    name = getattr(tokenizer, "name_or_path", "") or ""
    if "internlm/internlm-xcomposer2" in name:
        tokenizer.chat_template = INTERNLM_XCOMPOSER2_TEMPLATE
    prompt = tokenizer.apply_chat_template(
        conversation=messages,
        tokenize=False,
        add_generation_prompt=getattr(request, "add_generation_prompt",
                                      True))
    return prompt, images
