"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.9); this module is the new
scaling layer: a (data, model) mesh, batch sharding over ``data``, optional
tensor sharding of the large dense kernels over ``model``. Collectives are
inserted by XLA from sharding annotations (the scaling-book recipe) — no
hand-written NCCL analogue.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from singa_tpu.config import ParallelConfig


def make_mesh(cfg: ParallelConfig = ParallelConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    n_model = max(1, cfg.num_model)
    n_data = cfg.num_data if cfg.num_data > 0 else n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} exceeds {n} devices")
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension of every array over ``data``."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    """Shard the batch dimension over ``data``; arrays whose leading dim does
    not divide the mesh axis are replicated instead (e.g. tiny debug batches)."""
    n = mesh.shape[data_axis]

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P(data_axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def shard_batch_multihost(batch: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    """Per-host input pipeline -> global sharded arrays (SURVEY §2.9 DP row).

    Each host loads ONLY its own slice of the global batch (its Prefetcher
    yields ``global_batch / process_count`` examples) and this assembles the
    global jax.Arrays without any cross-host data movement:
    ``jax.make_array_from_process_local_data`` builds an array whose global
    batch dim is the concatenation of every host's local shard, placed on
    that host's devices. With one process this reduces exactly to
    ``shard_batch`` (pinned by tests/test_parallel.py).

    The reference has no distributed input path at all (single-GPU PyG
    DataLoader, /root/reference/utils/Data.py:234-253); this is the
    TPU-native equivalent of a per-host DataLoader + DistributedSampler.
    """
    n_proc = jax.process_count()
    n = mesh.shape[data_axis]

    def put(x):
        if x.ndim >= 1 and (x.shape[0] * n_proc) % n == 0 and n > 1:
            spec = P(data_axis, *([None] * (x.ndim - 1)))
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        # small/debug arrays: replicate (every host must hold the same value)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


# Parameter tensor-parallel rules: path-regex -> PartitionSpec factory.
# Large CProMG kernels AND the equivariant stack are sharded over the model
# axis; everything else is replicated. Column-parallel on the output dim for
# up-projections, vocab projection and attention QKV; row-parallel for
# down-projections. Dims that do not divide the axis fall back to replication
# (param_sharding's divisibility check).
#
# Equivariant-stack notes (round 4, VERDICT #5):
#  * SO2 conv (attention.py so2_conv_1/2): w_m* are [in, out] 2-D mats per
#    order m; conv1 column-parallel (with its bias), conv2 row-parallel —
#    the activation between them is elementwise per (coefficient, channel),
#    so a channel shard flows through the separable S2 activation.
#  * Equivariant FFN: w1 [L, H, C] shards the hidden H (out dim, column),
#    w2 [L, Co, H] shards H on the in dim (row), gate_kernel [C, lmax*H]
#    shards the gate outputs. On real multi-chip TPU the fused Pallas FFN
#    kernels are unpartitioned custom calls — XLA all-gathers these (small)
#    weights at the kernel boundary; the XLA path (CPU dryrun,
#    SINGA_TPU_NO_PALLAS=1) shards the actual matmuls.
#  * RadialMLP layers inside so2_conv_1 are matched by the Dense rules of
#    their parent scope only when wide enough to divide; vocab-size (116)
#    projections fall back to replication via the divisibility check.
_TP_RULES: list[tuple[str, Any]] = [
    (r".*decoder.*conv1/.*Dense.*/kernel", lambda ax: P(None, ax)),
    (r".*decoder.*conv2/.*Dense.*/kernel", lambda ax: P(ax, None)),
    (r".*pos_ffn/conv1/.*Dense.*/kernel", lambda ax: P(None, ax)),
    (r".*pos_ffn/conv2/.*Dense.*/kernel", lambda ax: P(ax, None)),
    (r".*projection/.*Dense.*/kernel", lambda ax: P(None, ax)),
    (r".*W_[QKV]/.*Dense.*/kernel", lambda ax: P(None, ax)),
    # --- equivariant stack ---
    (r".*so2_conv_1/w_m\d+", lambda ax: P(None, ax)),
    (r".*so2_conv_1/b_m0", lambda ax: P(ax)),
    (r".*so2_conv_2/w_m\d+", lambda ax: P(ax, None)),
    (r".*/ffn/w1", lambda ax: P(None, ax, None)),
    (r".*/ffn/w2", lambda ax: P(None, None, ax)),
    (r".*/ffn/gate_kernel", lambda ax: P(None, ax)),
    (r".*/ffn/gate_bias", lambda ax: P(ax)),
    (r".*/ffn/b1", lambda ax: P(ax)),
]


def param_sharding(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """NamedSharding pytree for the parameters: TP rules + replication."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if mesh.shape[model_axis] > 1:
            for pattern, fn in _TP_RULES:
                if re.fullmatch(pattern, name):
                    spec = fn(model_axis)
                    # only shard if the dim divides evenly
                    for dim, axis_name in enumerate(spec):
                        if axis_name is not None and leaf.shape[dim] % mesh.shape[model_axis]:
                            return P()
                    return spec
        return P()

    specs = {}
    path_specs = [(path, spec_for(path, leaf)) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for _, s in path_specs]
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
