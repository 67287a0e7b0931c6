"""pqt_tpu: a TPU-native Product-Quantization-Tree ANN engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cgtuebingen/Product-Quantization-Tree (CVPR'16, arXiv 1702.05911):
billion-scale approximate nearest-neighbor search with a two-level product
quantization tree, hashed inverted file, multi-probe traversal, and
line-quantization re-ranking — built for TPU meshes instead of a single GPU.
"""

from pqt_tpu.config import (GIST1M_CONFIG, PQTConfig, SIFT1B_CONFIG,
                            SIFT1M_CONFIG)
from pqt_tpu.models.db import (ChunkedDBBuilder, PQTDatabase, build_database,
                               encode_bins, encode_line_codes)
from pqt_tpu.models.query import QueryResult, query_knn, query_knn_refine
from pqt_tpu.models.split import (SplitDatabase, build_split_database,
                                  load_split_database, query_knn_split,
                                  save_split_database)
from pqt_tpu.models.tree import PQTree, train_tree, train_tree_split

__version__ = "0.1.0"

__all__ = [
    "PQTConfig", "SIFT1M_CONFIG", "SIFT1B_CONFIG", "GIST1M_CONFIG",
    "PQTree", "train_tree", "train_tree_split",
    "PQTDatabase", "build_database", "ChunkedDBBuilder",
    "encode_bins", "encode_line_codes",
    "QueryResult", "query_knn", "query_knn_refine",
    "SplitDatabase", "build_split_database", "query_knn_split",
    "save_split_database", "load_split_database",
]
