"""Generic vector quantization utilities (VQ / residual VQ).

General-purpose L2-nearest VQ and residual VQ encode/decode, mirroring the
reference's utility module (src/models/codec/quantizer.rs). The production
pipeline uses the specialized codebooks inside the vocoder / Mimi encoder;
this module is the reusable building block for codec experimentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class VectorQuantizer:
    """Single codebook, euclidean nearest-neighbour quantization."""

    def __init__(self, codebook: jnp.ndarray):
        """codebook: [codebook_size, dim]."""
        self.codebook = jnp.asarray(codebook)

    @classmethod
    def random(cls, key, codebook_size: int, dim: int, scale: float = 1.0):
        return cls(jax.random.normal(key, (codebook_size, dim)) * scale)

    @property
    def size(self) -> int:
        return self.codebook.shape[0]

    @property
    def dim(self) -> int:
        return self.codebook.shape[1]

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x: [batch, seq, dim] -> (quantized [B,S,D], indices [B,S])."""
        c = self.codebook
        # ||x - c||^2 = ||x||^2 + ||c||^2 - 2 x.c
        d2 = (
            (x**2).sum(-1, keepdims=True)
            - 2.0 * x @ c.T
            + (c**2).sum(-1)[None, None, :]
        )
        indices = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        return self.decode(indices), indices

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.codebook[indices]


class ResidualVectorQuantizer:
    """Stack of VQ layers, each quantizing the previous layer's residual."""

    def __init__(self, codebooks: jnp.ndarray):
        """codebooks: [num_quantizers, codebook_size, dim]."""
        self.codebooks = jnp.asarray(codebooks)

    @classmethod
    def random(cls, key, num_quantizers: int, codebook_size: int, dim: int):
        return cls(jax.random.normal(key, (num_quantizers, codebook_size, dim)))

    @property
    def num_quantizers(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dim(self) -> int:
        return self.codebooks.shape[2]

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, S, D] -> (quantized sum [B,S,D], indices [B, Q, S])."""

        def step(residual, codebook):
            vq = VectorQuantizer(codebook)
            quantized, idx = vq.encode(residual)
            return residual - quantized, (quantized, idx)

        residual, (quantized, indices) = jax.lax.scan(step, x, self.codebooks)
        return quantized.sum(axis=0), jnp.moveaxis(indices, 0, 1)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices: [B, Q, S] -> per-layer embeddings [B, S, Q, D]."""
        gathered = jax.vmap(lambda cb, idx: cb[idx], in_axes=(0, 1), out_axes=1)(
            self.codebooks, indices
        )  # [B, Q, S, D]
        return jnp.swapaxes(gathered, 1, 2)

    def decode_sum(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices: [B, Q, S] -> summed embeddings [B, S, D]."""
        return self.decode(indices).sum(axis=2)
