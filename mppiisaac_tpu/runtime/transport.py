"""Tensor byte transport — wire-compatible with the reference's
`mppiisaac/utils/transport.py:5-14` (torch.save round-trip), so external
world-processes written against the reference can talk to this planner
unchanged. Falls back to a numpy .npy container when torch is unavailable."""
from __future__ import annotations

import io

import jax.numpy as jnp
import numpy as np

try:
    import torch

    _HAS_TORCH = True
except Exception:  # pragma: no cover
    _HAS_TORCH = False


def torch_to_bytes(t) -> bytes:
    buf = io.BytesIO()
    if _HAS_TORCH and isinstance(t, torch.Tensor):
        torch.save(t, buf)
    elif _HAS_TORCH:
        torch.save(torch.as_tensor(np.asarray(t)), buf)
    else:
        np.save(buf, np.asarray(t))
    buf.seek(0)
    return buf.read()


def bytes_to_torch(b: bytes):
    buf = io.BytesIO(b)
    if _HAS_TORCH:
        try:
            return torch.load(buf, weights_only=True, map_location="cpu")
        except Exception:
            buf.seek(0)
            return torch.as_tensor(np.load(buf))
    return np.load(buf)


def bytes_to_jnp(b: bytes) -> jnp.ndarray:
    t = bytes_to_torch(b)
    if _HAS_TORCH and isinstance(t, torch.Tensor):
        return jnp.asarray(t.detach().cpu().numpy())
    return jnp.asarray(np.asarray(t))


def jnp_to_bytes(x) -> bytes:
    return torch_to_bytes(np.asarray(x))
