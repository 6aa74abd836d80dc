"""Tensorizer-format loading (reference:
vllm/model_executor/model_loader/tensorizer.py, 432 LoC — streamed,
optionally encrypted deserialization of a pre-serialized checkpoint,
including S3 URIs).

Like the reference, this depends on the external ``tensorizer`` package
(the reference errors at import too, tensorizer.py:13-20); when absent
a clear ImportError explains the gate. The deserialized tensors feed
the model's normal ``load_weights`` name mapping, so any architecture
that loads from safetensors also loads from a tensorized file.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def _require_tensorizer():
    try:
        import tensorizer  # noqa: F401
        return tensorizer
    except ImportError as e:
        raise ImportError(
            "load_format='tensorizer' requires the `tensorizer` "
            "package (same gate as the reference, "
            "model_loader/tensorizer.py:13-20). Install it or use "
            "safetensors / sharded_state.") from e


def load_tensorized_params(path: str, *, encryption_key: str = None
                           ) -> Iterator[Tuple[str, np.ndarray]]:
    """Yields (name, tensor) from a tensorized file/URI."""
    tz = _require_tensorizer()
    from tensorizer import DecryptionParams, TensorDeserializer
    from tensorizer.stream_io import open_stream

    dec = None
    if encryption_key is not None:
        dec = DecryptionParams.from_key(encryption_key)
    with open_stream(path, "rb") as stream:
        with TensorDeserializer(stream, lazy_load=True,
                                encryption=dec,
                                device="cpu") as des:
            for name, tensor in des.items():
                yield name, np.asarray(tensor)
    del tz


def serialize_params(named_tensors, path: str, *,
                     encryption_key: str = None) -> None:
    """Write (name, tensor) pairs as a tensorized file (counterpart of
    the reference's tensorize_vllm_model example)."""
    _require_tensorizer()
    import torch
    from tensorizer import EncryptionParams, TensorSerializer
    from tensorizer.stream_io import open_stream

    enc = None
    if encryption_key is not None:
        enc = EncryptionParams(key=encryption_key.encode())
    with open_stream(path, "wb") as stream:
        ser = TensorSerializer(stream, encryption=enc)
        ser.write_state_dict({
            name: torch.from_numpy(np.ascontiguousarray(t))
            for name, t in named_tensors
        })
        ser.close()
