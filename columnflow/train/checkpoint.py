"""Checkpointing: versioned pytree save/restore.

Replaces the reference's whole-object pickles (reference:
scripts/wta_ode.py:215-216, scripts/parity_ode.py:210-211,281-282) with flat
npz checkpoints of (params, optimizer state, RNG key, step) + a JSON
manifest — no code objects, stable across refactors, no dependencies
beyond numpy. (Orbax integration is a possible future extension; at these
state sizes — KBs of weights — sync npz is strictly simpler.)
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_FORMAT_VERSION = 1


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, *, params, opt_state=None, key=None,
                    step: int = 0, extra: dict | None = None):
    """Save a training checkpoint as .npz + .json manifest."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    blobs = {}
    manifest = {"format_version": _FORMAT_VERSION, "step": int(step),
                "extra": extra or {}}

    for name, tree in (("params", params), ("opt_state", opt_state),
                       ("key", key)):
        if tree is None:
            continue
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        manifest[f"{name}_treedef"] = str(treedef)
        manifest[f"{name}_num_leaves"] = len(leaves)
        for i, leaf in enumerate(leaves):
            blobs[f"{name}__{i}"] = np.asarray(leaf)

    np.savez(path if path.endswith(".npz") else path + ".npz", **blobs)
    man_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(man_path, "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str, *, params_like, opt_state_like=None,
                    key_like=None, strict: bool = True):
    """Restore a checkpoint into the structure of the provided examples.

    ``strict=True`` (default) validates the stored pytree structure against
    the provided ``*_like`` examples — treedef string, leaf count, and leaf
    shapes must match, so a stale checkpoint cannot silently mis-restore
    into a refactored pytree that happens to have the same leaf count.

    Returns dict with 'params', 'opt_state', 'key', 'step', 'extra'.
    """
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    with open(base + ".json") as f:
        manifest = json.load(f)

    def restore(name, like):
        if like is None:
            return None
        leaves, treedef = jax.tree_util.tree_flatten(like)
        n = manifest.get(f"{name}_num_leaves")
        if n is None:
            return None
        if strict:
            stored_td = manifest.get(f"{name}_treedef")
            if stored_td is not None and stored_td != str(treedef):
                raise ValueError(
                    f"checkpoint {base!r}: stored '{name}' pytree structure "
                    f"does not match the provided {name}_like.\n"
                    f"  stored:   {stored_td}\n  expected: {treedef}"
                )
            if n != len(leaves):
                raise ValueError(
                    f"checkpoint {base!r}: '{name}' has {n} stored leaves, "
                    f"{name}_like has {len(leaves)}"
                )
        loaded = [data[f"{name}__{i}"] for i in range(n)]
        if strict:
            for i, (got, want) in enumerate(zip(loaded, leaves)):
                want_shape = tuple(np.shape(want))
                if tuple(got.shape) != want_shape:
                    raise ValueError(
                        f"checkpoint {base!r}: '{name}' leaf {i} has shape "
                        f"{tuple(got.shape)}, {name}_like expects "
                        f"{want_shape}"
                    )
        return jax.tree_util.tree_unflatten(treedef, loaded)

    return {
        "params": restore("params", params_like),
        "opt_state": restore("opt_state", opt_state_like),
        "key": restore("key", key_like),
        "step": manifest["step"],
        "extra": manifest.get("extra", {}),
    }
