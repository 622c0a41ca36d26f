"""Stream-group software pipelining shared by the codec drivers.

Every codec in this framework writes ONE bitstream per image, so a batch
can be split into contiguous groups that encode/decode independently.
Running the groups on threads overlaps one group's blocking phases (the
device->host index fetch — a full link round-trip per AR slice on
remote-TPU hosts — and the native rANS, both of which release the GIL)
with another group's device compute and transfers.

The grouping MUST be symmetric between compress and decompress: XLA
float results vary with batch shape, and the AR context is only
bit-identical encoder/decoder when both run it at the same group shapes
(see ``CharmCodec._group_sizes``, which uses the same formula).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Sequence

import numpy as np


def group_bounds(B: int, pipeline_groups: int) -> np.ndarray:
    """Contiguous split points [0, ..., B]; ceil-first deterministic sizes."""
    g = min(max(pipeline_groups, 1), B)
    sizes = [B // g + (1 if i < B % g else 0) for i in range(g)]
    return np.cumsum([0] + sizes)


def run_groups(fn: Callable, args_list: Sequence[tuple]) -> List[Any]:
    """Run ``fn(*args)`` per group on threads, results in group order."""
    if len(args_list) == 1:
        return [fn(*args_list[0])]
    with ThreadPoolExecutor(max_workers=len(args_list)) as ex:
        futs = [ex.submit(fn, *a) for a in args_list]
        return [f.result() for f in futs]


def split_strings(strings: Sequence[Sequence[bytes]], bounds) -> List[list]:
    """[[streams...] per kind] -> per-group [[streams slice] per kind]."""
    return [
        [list(kind[a:b]) for kind in strings]
        for a, b in zip(bounds[:-1], bounds[1:])
    ]


def merge_strings(per_group: Sequence[Sequence[list]]) -> List[list]:
    """Inverse of :func:`split_strings` over group outputs."""
    n_kinds = len(per_group[0])
    return [
        [s for g in per_group for s in g[i]] for i in range(n_kinds)
    ]


def merge_outputs(outs: Sequence[Dict[str, Any]], array_keys) -> Dict[str, Any]:
    """Merge per-group output dicts: "strings" lists concatenate per kind,
    ``array_keys`` concatenate along batch, everything else (scalar
    metadata like shapes) is taken from the first group."""
    import jax.numpy as jnp

    merged: Dict[str, Any] = dict(outs[0])
    if "strings" in merged:
        merged["strings"] = merge_strings([o["strings"] for o in outs])
    for k in array_keys:
        if k in outs[0]:
            merged[k] = jnp.concatenate([o[k] for o in outs], axis=0)
    return merged
