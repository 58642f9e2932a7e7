from .lut import build_row_tables
from .core import (
    EnvState,
    afterstates,
    init_env,
    is_terminal,
    new_boards,
    pack_rows,
    spawn,
)

__all__ = [
    "build_row_tables",
    "EnvState",
    "afterstates",
    "init_env",
    "is_terminal",
    "new_boards",
    "pack_rows",
    "spawn",
]
