from .mesh import (
    make_mesh,
    shard_td_state,
    td_state_shardings,
)

__all__ = ["make_mesh", "shard_td_state", "td_state_shardings"]
