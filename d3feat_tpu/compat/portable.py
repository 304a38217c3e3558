"""Portable params-only weight artifacts (single .npz file).

Orbax snapshots carry the full TrainState (params + optimizer momentum +
step), are directory-shaped, and are ~3x the size of the parameters —
fine for resumable training runs, wrong for shipping a trained model
inside the repository. This module stores just what inference needs
(``params`` + ``model_state``, i.e. the BatchNorm statistics the eval
branch folds in — reference eval loads ``model_best_acc.pth``'s
state_dict the same way, reference test.py:181) as one compressed npz.

Import is template-based: the caller provides freshly-initialised
pytrees (``init_train_state``) and the stored leaves are matched to the
template's deterministic flatten order, with the recorded key paths
checked one-by-one so a config/architecture mismatch fails loudly
instead of silently loading weights into the wrong block.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(p) for p, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    return paths, leaves, treedef


def export_npz(path: str, params: Any, model_state: Any,
               meta: Optional[dict] = None) -> None:
    """Write params + model_state (+ JSON-able meta) as one .npz file."""
    p_paths, p_leaves, _ = _flatten(params)
    s_paths, s_leaves, _ = _flatten(model_state)
    arrays = {f"p_{i:05d}": np.asarray(x) for i, x in enumerate(p_leaves)}
    arrays.update({f"s_{i:05d}": np.asarray(x)
                   for i, x in enumerate(s_leaves)})
    np.savez_compressed(
        path,
        __paths_params__=np.array(p_paths),
        __paths_state__=np.array(s_paths),
        __meta__=np.array(json.dumps(meta or {})),
        **arrays,
    )


def import_npz(path: str, params_template: Any, model_state_template: Any
               ) -> Tuple[Any, Any, dict]:
    """Load an export_npz artifact into the templates' pytree structure."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))

        def restore(tag: str, template: Any, stored_paths: np.ndarray) -> Any:
            paths, leaves, treedef = _flatten(template)
            stored = [str(s) for s in stored_paths]
            if paths != stored:
                a, b = set(paths), set(stored)
                raise ValueError(
                    f"{tag}: artifact does not match this architecture/"
                    f"config; missing={sorted(a - b)[:4]} "
                    f"extra={sorted(b - a)[:4]}")
            out = []
            for i, (p, tmpl) in enumerate(zip(paths, leaves)):
                arr = z[f"{tag}_{i:05d}"]
                t = np.asarray(tmpl)
                if arr.shape != t.shape:
                    raise ValueError(
                        f"{tag}{p}: shape {arr.shape} != template {t.shape}")
                if arr.dtype != t.dtype:
                    # float64 -> float32 is silent precision loss; anything
                    # int-ish or narrowing is a wrong-artifact signal
                    import warnings

                    warnings.warn(
                        f"{tag}{p}: stored dtype {arr.dtype} cast to "
                        f"template dtype {t.dtype}", stacklevel=3)
                out.append(arr.astype(t.dtype))
            return jax.tree_util.tree_unflatten(treedef, out)

        params = restore("p", params_template, z["__paths_params__"])
        state = restore("s", model_state_template, z["__paths_state__"])
    return params, state, meta
