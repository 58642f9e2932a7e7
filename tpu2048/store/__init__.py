from .artifacts import ArtifactStore, LocalStore, MemoryStore, S3Store, open_store
from .checkpoint import load_agent, save_agent

__all__ = [
    "ArtifactStore",
    "LocalStore",
    "MemoryStore",
    "S3Store",
    "open_store",
    "load_agent",
    "save_agent",
]
