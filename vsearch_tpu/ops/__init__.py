"""TPU-native vocabulary-space math kernels (layer 0 of the framework)."""
from .activations import elu1p
from .sparse import (
    build_topk_mask,
    topk_sparsify,
    build_bow_mask,
    build_cts_mask,
    init_cts_mask_like,
)
from .ell import (ELLMatrix, ell_from_topk, ell_matvec_chunked,
                  ell_matvec_scores, ell_row_block_scores)
from .search import dense_topk_search, topk_from_scores, merge_shard_topk

__all__ = [
    "elu1p",
    "build_topk_mask",
    "topk_sparsify",
    "build_bow_mask",
    "build_cts_mask",
    "init_cts_mask_like",
    "ELLMatrix",
    "ell_from_topk",
    "ell_matvec_chunked",
    "ell_matvec_scores",
    "ell_row_block_scores",
    "dense_topk_search",
    "topk_from_scores",
    "merge_shard_topk",
]
