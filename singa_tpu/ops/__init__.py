from singa_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from singa_tpu.ops.smearing import GaussianSmearing, gaussian_smearing
from singa_tpu.ops.knn import knn_graph, knn_neighbors, radius_graph

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "GaussianSmearing",
    "gaussian_smearing",
    "knn_graph",
    "knn_neighbors",
    "radius_graph",
]
