"""Synthetic miniature MMEA dataset.

A learnable two-KG alignment task used by the test-suite and smoke benches
(no reference equivalent — fills the fixture role SURVEY.md §4 calls for).
Aligned entity pairs share a latent vector; all modality features are noisy
views of it, so contrastive alignment converges within a few hundred steps.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def generate_synthetic_kg(
    n_ents: int = 200,
    n_rels: int = 20,
    n_triples: int = 800,
    img_dim: int = 64,
    seed: int = 0,
    latent_dim: int = 16,
    noise: float = 0.3,
):
    """Returns (ills, triples, img_dict, ent_attrs, left_ents, right_ents).

    Entities [0, n1) form KG1, [n1, n) form KG2; pair (i, n1 + i) is aligned.
    ~10% of entities have no image (exercises the missing-image fill path).
    """
    rng = np.random.default_rng(seed)
    n1 = n_ents // 2
    n2 = n_ents - n1
    n_pairs = min(n1, n2)

    latent = rng.normal(size=(n_pairs, latent_dim))

    def noisy_view(dim: int) -> np.ndarray:
        proj = rng.normal(size=(latent_dim, dim)) / np.sqrt(latent_dim)
        both = np.concatenate([latent, latent], axis=0) @ proj
        return both + noise * rng.normal(size=both.shape)

    img = noisy_view(img_dim)

    img_dict: Dict[int, np.ndarray] = {}
    for k in range(2 * n_pairs):
        ent = k if k < n_pairs else n1 + (k - n_pairs)
        if rng.random() > 0.1:
            img_dict[ent] = img[k]

    # attributes: latent-bucketed attribute names shared across KGs
    ent_attrs: Dict[int, List[str]] = {}
    n_attr_names = 50
    attr_proj = rng.normal(size=(latent_dim, n_attr_names))
    logits = latent @ attr_proj
    for k in range(2 * n_pairs):
        ent = k if k < n_pairs else n1 + (k - n_pairs)
        row = logits[k % n_pairs]
        chosen = np.argsort(-row)[:5]
        ent_attrs[ent] = [f"attr_{c}" for c in chosen]

    # triples: correlated structure — if (h1, r, t1) in KG1, mirror in KG2 w.p. 0.7
    triples: List[Tuple[int, int, int]] = []
    kg1_triples: List[Tuple[int, int, int]] = []
    while len(kg1_triples) < n_triples // 2:
        h, t = rng.integers(0, n1, size=2)
        if h == t:
            continue
        r = int(rng.integers(0, n_rels // 2))
        kg1_triples.append((int(h), r, int(t)))
    kg2_triples: List[Tuple[int, int, int]] = []
    for h, r, t in kg1_triples:
        if h < n_pairs and t < n_pairs and rng.random() < 0.7:
            kg2_triples.append((n1 + h, n_rels // 2 + r, n1 + t))
    while len(kg2_triples) < n_triples - len(kg1_triples):
        h, t = rng.integers(0, n2, size=2)
        if h == t:
            continue
        r = int(rng.integers(n_rels // 2, n_rels))
        kg2_triples.append((n1 + int(h), r, n1 + int(t)))
    triples = kg1_triples + kg2_triples

    ills = [(i, n1 + i) for i in range(n_pairs)]
    left_ents = list(range(n1))
    right_ents = list(range(n1, n_ents))
    return ills, triples, img_dict, ent_attrs, left_ents, right_ents, kg1_triples, kg2_triples
