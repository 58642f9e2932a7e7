from .ntuple import (
    TupleSet,
    all_symmetry_indices,
    feature_indices,
    get_tuple_set,
    init_weights,
)

__all__ = [
    "TupleSet",
    "all_symmetry_indices",
    "feature_indices",
    "get_tuple_set",
    "init_weights",
]
