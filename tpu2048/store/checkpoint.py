"""Agent checkpoint / resume.

Capability parity with the reference's split persistence
(``/root/reference/game2048/r_learning.py:166-200``): metadata under
``a/<name>.json`` and the weight table under ``weights/<name>.npz`` —
but as version-safe JSON + arrays instead of pickled class instances,
and including everything needed for stream-exact resume: schedule state
(alpha, next_decay, top_tile), episode counter, train history, and the
RNG key (carried in ``extras`` and restored by ``Trainer``, so a
resumed run continues the original random stream instead of replaying
it; env boards themselves restart fresh — only their spawn randomness
continues).  The reference's "resume and retune" capability (reload,
then edit hyperparameters) is preserved: load returns a plain config
dict that can be modified before rebuilding the state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import AgentConfig, agent_config_from_dict, to_dict
from .artifacts import ArtifactStore


def agent_key(name: str) -> str:
    return f"a/{name}.json"


def weights_key(name: str) -> str:
    return f"weights/{name}.npz"


def game_key(name: str) -> str:
    return f"g/{name}.npz"


def save_agent(
    store: ArtifactStore,
    name: str,
    acfg: AgentConfig,
    weights: np.ndarray,
    meta: Optional[Dict[str, Any]] = None,
    extras: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Atomic two-part save: JSON metadata + npz weights.

    ``extras`` carries additional state arrays (the temporal-coherence
    E/A accumulators, the training RNG key) in the same npz; their
    dtypes are preserved (the RNG key is uint32).
    """
    doc = {
        "name": name,
        "config": to_dict(acfg),
        "meta": meta or {},
        "format_version": 1,
    }
    arrays = {"weights": np.asarray(weights, np.float32)}
    for k, v in (extras or {}).items():
        arrays[k] = np.asarray(v)
    store.save(weights_key(name), arrays)
    store.save(agent_key(name), doc)


def load_agent(
    store: ArtifactStore, name: str
) -> Tuple[AgentConfig, np.ndarray, Dict[str, Any]]:
    doc = store.load(agent_key(name))
    if doc is None:
        raise FileNotFoundError(f"no agent '{name}' in store")
    w = store.load(weights_key(name))
    if w is None:
        raise FileNotFoundError(f"agent '{name}' has no weights")
    acfg = agent_config_from_dict(doc.get("config", {}))
    meta = doc.get("meta", {})
    extras = {k: w[k] for k in w if k != "weights"}
    if extras:
        meta = {**meta, "extras": extras}
    return acfg, w["weights"], meta


def load_agent_dense(
    store: ArtifactStore, name: str
) -> Tuple[AgentConfig, np.ndarray, Dict[str, Any]]:
    """``load_agent`` for identity-index consumers (trial, watch
    bodies, the native engine, the viewer): an agent trained in
    canonical-orbit form (``sym_impl="canonical"``) is expanded to the
    equivalent orbit-constant dense table; anything else passes
    through unchanged.  One fold pass over the table, host-side."""
    acfg, weights, meta = load_agent(store, name)
    from ..features.canonical import is_canonical, to_dense_table
    from ..features.ntuple import get_tuple_set

    if is_canonical(acfg):
        import jax.numpy as jnp

        ts = get_tuple_set(acfg.n)
        weights = np.asarray(to_dense_table(ts, jnp.asarray(weights)))
    return acfg, weights, meta


def save_game(store: ArtifactStore, name: str, record: Dict[str, Any]) -> None:
    """Game record: starting board + move/spawn logs (replayable)."""
    store.save(
        game_key(name),
        {
            "starting_position": np.asarray(
                record["starting_position"], np.int8
            ),
            "moves": np.asarray(record["moves"], np.int8),
            "tiles": np.asarray(record["tiles"], np.int8).reshape(-1, 3),
            "score": np.asarray([record["score"]], np.int64),
            "odometer": np.asarray([record["odometer"]], np.int64),
            "final_board": np.asarray(record["final_board"], np.int8),
        },
    )


def load_game(store: ArtifactStore, name: str) -> Dict[str, Any]:
    z = store.load(game_key(name))
    if z is None:
        raise FileNotFoundError(f"no game '{name}' in store")
    return {
        "starting_position": z["starting_position"],
        "moves": z["moves"],
        "tiles": z["tiles"],
        "score": int(z["score"][0]),
        "odometer": int(z["odometer"][0]),
        "final_board": z["final_board"],
    }
