"""Datasets: npz shard reader (the ETL contract) and the synthetic generator.

Replaces the reference's per-item ``torch.load(...).to(device)`` dataset and
PyG DataLoader stack (/root/reference/utils/Data.py:172-253). Each complex is
one ``.npz`` with the fixed-shape ComplexBatch fields (unbatched); batching is
a stack. Deliberately not replicated: the reference's hard-coded
``lt_train[5000:5512]`` subset (Data.py:230) and shuffle=True on val/test
loaders (Data.py:241-253).
"""
from __future__ import annotations

import os
from typing import Iterator, Sequence

import numpy as np

from singa_tpu.config import ShapeConfig
from singa_tpu.data.batch import (
    ComplexBatch,
    EdgeSet,
    NodeSet,
    PropertySet,
    TokenSet,
    attach_tables,
    synthetic_batch,
)

# field name -> (group, attr) mapping for npz serialisation
_NODE_FIELDS = ("x", "pos", "atomic_num", "mask", "lap_pe")
_EDGE_FIELDS = ("index", "attr", "mask")
_PROP_FIELDS = ("sas", "logp", "qed", "weight", "tpsa", "vina")
_TOKEN_FIELDS = ("input", "target")


def save_complex(path: str, sample: ComplexBatch) -> None:
    """Write one (possibly batch-size-1) complex as .npz."""
    arrays = {}
    for group in ("protein", "ligand"):
        ns = getattr(sample, group)
        for f in _NODE_FIELDS:
            arrays[f"{group}.{f}"] = np.asarray(getattr(ns, f))[0]
    for group in ("pp", "ll", "lp", "pl"):
        es = getattr(sample, group)
        for f in _EDGE_FIELDS:
            arrays[f"{group}.{f}"] = np.asarray(getattr(es, f))[0]
    for f in _PROP_FIELDS:
        arrays[f"props.{f}"] = np.asarray(getattr(sample.props, f))[0]
    for f in _TOKEN_FIELDS:
        arrays[f"tokens.{f}"] = np.asarray(getattr(sample.tokens, f))[0]
    np.savez_compressed(path, **arrays)


def _stack(files: Sequence[dict]) -> ComplexBatch:
    def st(key):
        return np.stack([f[key] for f in files])

    batch = ComplexBatch(
        protein=NodeSet(*[st(f"protein.{f}") for f in _NODE_FIELDS]),
        ligand=NodeSet(*[st(f"ligand.{f}") for f in _NODE_FIELDS]),
        pp=EdgeSet(*[st(f"pp.{f}") for f in _EDGE_FIELDS]),
        ll=EdgeSet(*[st(f"ll.{f}") for f in _EDGE_FIELDS]),
        lp=EdgeSet(*[st(f"lp.{f}") for f in _EDGE_FIELDS]),
        pl=EdgeSet(*[st(f"pl.{f}") for f in _EDGE_FIELDS]),
        props=PropertySet(*[st(f"props.{f}") for f in _PROP_FIELDS]),
        tokens=TokenSet(*[st(f"tokens.{f}") for f in _TOKEN_FIELDS]),
    )
    return attach_tables(batch)


class NpzDataset:
    """Directory of .npz complexes -> shuffled fixed-size batches."""

    def __init__(self, root: str, batch_size: int, shuffle: bool = True, seed: int = 0):
        self.files = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".npz")
        )
        if not self.files:
            raise FileNotFoundError(f"no .npz complexes under {root}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return max(1, len(self.files) // self.batch_size)

    def epoch(self) -> Iterator[ComplexBatch]:
        order = np.arange(len(self.files))
        if self.shuffle:
            self.rng.shuffle(order)
        # datasets smaller than one batch (e.g. the bundled reference
        # complexes used as the overfit anchor) upsample with replacement to
        # a single full batch — static shapes require every batch at exactly
        # batch_size, and an empty epoch would otherwise spin forever
        order = _upsample(order, self.batch_size, self.rng)
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            chunk = [dict(np.load(self.files[i])) for i in order[start : start + self.batch_size]]
            yield _stack(chunk)

    def __iter__(self):
        while True:
            yield from self.epoch()


def _upsample(order: np.ndarray, batch_size: int, rng) -> np.ndarray:
    """Pad a (shuffled) index/path array to at least one full batch by
    sampling existing entries with replacement. No-op when already full."""
    if len(order) >= batch_size:
        return order
    extra = rng.choice(order, size=batch_size - len(order), replace=True)
    return np.concatenate([order, extra])


class BucketedNpzDataset:
    """Mixed pocket-size shards -> homogeneous fixed-shape batches per bucket.

    The graph-size scaling story (SURVEY §5.7): instead of one padding bucket
    (ShapeConfig) that every pocket must fit, the ETL emits shards in discrete
    buckets (384- and 576-protein-node today — tools/make_dataset.py
    --bucket) and this loader groups files by their actual array shapes,
    yielding batches that are homogeneous per bucket. Each distinct bucket
    shape triggers exactly one extra XLA compile of the (shape-polymorphic)
    train step — the jit cache keys on shapes — so steady-state cost is one
    resident executable per bucket, not dynamic shapes. Buckets are
    interleaved proportionally to their file counts so an epoch visits every
    complex once, shuffled within bucket.

    Replaces the role of PyG's dynamic per-batch shapes
    (/root/reference/utils/Data.py:237-253) with a TPU-compatible design.
    """

    def __init__(self, root: str, batch_size: int, shuffle: bool = True, seed: int = 0):
        files = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".npz")
        )
        if not files:
            raise FileNotFoundError(f"no .npz complexes under {root}")
        self.buckets: dict[tuple, list[str]] = {}
        for path in files:
            with np.load(path) as z:
                # bucket signature: node capacity + edge capacity (edge index
                # is stored [E, 2], so the count is axis 0)
                sig = (z["protein.x"].shape[0], z["pp.index"].shape[0])
            self.buckets.setdefault(sig, []).append(path)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return sum(max(1, len(v) // self.batch_size) for v in self.buckets.values())

    def epoch(self) -> Iterator[ComplexBatch]:
        # one shuffled queue of homogeneous batches across all buckets
        plans: list[list[str]] = []
        for sig in sorted(self.buckets):
            order = np.array(self.buckets[sig], dtype=object)
            if self.shuffle:
                self.rng.shuffle(order)
            # buckets smaller than one batch upsample with replacement (see
            # NpzDataset.epoch) — every complex still trains each epoch
            order = _upsample(order, self.batch_size, self.rng)
            for s in range(0, len(order) - self.batch_size + 1, self.batch_size):
                plans.append(list(order[s : s + self.batch_size]))
        if self.shuffle:
            self.rng.shuffle(plans)
        for plan in plans:
            yield _stack([dict(np.load(p)) for p in plan])

    def __iter__(self):
        while True:
            yield from self.epoch()


class SyntheticDataset:
    """Endless synthetic batches (benchmarks; smoke training)."""

    def __init__(
        self,
        batch_size: int,
        shapes: ShapeConfig = ShapeConfig(),
        tgt_len: int = 200,
        seed: int = 0,
        num_distinct: int = 8,
    ):
        self.batches = [
            synthetic_batch(seed + i, batch_size, shapes, tgt_len)
            for i in range(num_distinct)
        ]

    def __len__(self):
        return len(self.batches)

    def epoch(self) -> Iterator[ComplexBatch]:
        yield from self.batches

    def __iter__(self):
        i = 0
        while True:
            yield self.batches[i % len(self.batches)]
            i += 1
