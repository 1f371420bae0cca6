"""Map checkpoint / resume: serialize the whole SoA map to one .npz.

The reference never implemented this — `SaveMap/LoadMap` are a TODO
comment (reference include/System.h:102-104). With the map already a
flat pytree of arrays (world/map_store.py), a checkpoint is a single
np.savez of the leaves plus the host cursors — cheap enough to run per
keyframe if desired.
"""

from __future__ import annotations

import numpy as np

from structure_slam_pointline_tpu.world.map_store import MapCursors, MapState


def save_map(path: str, state: MapState, cursors: MapCursors) -> None:
    arrays = {f"f_{name}": np.asarray(getattr(state, name)) for name in state._fields}
    np.savez_compressed(
        path,
        __cursors__=np.asarray([cursors.n_kf, cursors.n_mp, cursors.n_ml], np.int64),
        **arrays,
    )


def load_map(path: str):
    """Returns (MapState, MapCursors)."""
    import jax.numpy as jnp

    data = np.load(path)
    cur = data["__cursors__"]
    fields = {}
    for name in MapState._fields:
        fields[name] = jnp.asarray(data[f"f_{name}"])
    return MapState(**fields), MapCursors(n_kf=int(cur[0]), n_mp=int(cur[1]), n_ml=int(cur[2]))


__all__ = ["save_map", "load_map"]
