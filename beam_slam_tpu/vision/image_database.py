"""Bag-of-binary-words image database.

Replaces the reference's beam_cv ``ImageDatabase`` (DBoW-backed; used by
VisualOdometry's local-map word search and by reloc requests): binary
descriptors are quantized against a fixed random vocabulary by Hamming
distance (one batched popcount matmul-like op), frames are tf-idf weighted
word histograms, and queries are cosine similarities over the whole database
in one einsum.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from beam_slam_tpu.vision import descriptors as desc_mod


class ImageDatabase:
    def __init__(self, n_words: int = 256, seed: int = 11):
        key = jax.random.PRNGKey(seed)
        self.vocab = jax.random.bits(key, (n_words, desc_mod.N_WORDS),
                                     jnp.uint32)
        self.n_words = n_words
        self.frames: List[float] = []
        self._hists: List[np.ndarray] = []
        self.word_of: Dict[float, np.ndarray] = {}

    def words_for(self, descs: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        d = desc_mod.hamming_matrix(descs, self.vocab)
        w = np.asarray(jnp.argmin(d, axis=1))
        return np.where(np.asarray(valid), w, -1)

    def _hist(self, words: np.ndarray) -> np.ndarray:
        h = np.bincount(words[words >= 0], minlength=self.n_words) \
            .astype(np.float64)
        n = np.linalg.norm(h)
        return h / n if n > 0 else h

    def add_frame(self, stamp: float, descs, valid):
        words = self.words_for(jnp.asarray(descs), jnp.asarray(valid))
        self.word_of[stamp] = words
        self.frames.append(stamp)
        self._hists.append(self._hist(words))

    def query(self, descs, valid, top_k: int = 3,
              exclude_recent: int = 1) -> List[Tuple[float, float]]:
        """Most similar database frames: [(stamp, cosine score)]."""
        if len(self.frames) <= exclude_recent:
            return []
        words = self.words_for(jnp.asarray(descs), jnp.asarray(valid))
        h = self._hist(words)
        H = np.stack(self._hists[: len(self._hists) - exclude_recent])
        scores = H @ h
        order = np.argsort(scores)[::-1][:top_k]
        return [(self.frames[i], float(scores[i])) for i in order]
