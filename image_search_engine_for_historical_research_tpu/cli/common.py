"""Shared CLI plumbing: network loading, matcher dispatch, scale parsing.

Counterpart of ``/root/reference/src/utils/networks.py`` (load_network) and the
argparse conventions shared by the reference drivers (offline.py:21-49,
test_rOP1m.py:21-54).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

from ..models import init_network, load_torch_checkpoint
from ..models.weights import assert_tree_shapes_match

DEFAULT_SCALES = (1.0, 2 ** 0.5, 0.5 ** 0.5)  # offline.py:86 / test_rOP1m.py


def load_network(
    network_path: Optional[str] = None,
    architecture: str = "resnet101",
    params: Optional[dict] = None,
):
    """Build the retrieval model, optionally loading a torch checkpoint
    (utils/networks.py:7-30: rebuild from meta + state_dict)."""
    meta_params = {"architecture": architecture}
    meta_params.update(params or {})

    if network_path and os.path.exists(network_path):
        variables, meta = load_torch_checkpoint(network_path)
        if meta:
            meta_params.update(
                {
                    "architecture": meta.get("architecture", architecture),
                    "pooling": meta.get("pooling", "gem"),
                    "whitening": bool(meta.get("whitening", True)),
                    "local_whitening": bool(meta.get("local_whitening", False)),
                    "soa": bool(meta.get("soa", True)),
                    "soa_layers": meta.get("soa_layers", "45"),
                }
            )
        model = init_network(meta_params)
        assert_tree_shapes_match(variables, model.params)
        import jax.numpy as jnp
        import jax

        model.params = jax.tree.map(jnp.asarray, variables)
        return model
    return init_network(meta_params)


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--network-path", default=None,
                        help="torch checkpoint (.pth) converted on load")
    parser.add_argument("--arch", default="resnet101")
    parser.add_argument("--image-size", type=int, default=1024)
    parser.add_argument("--multiscale", default="[1, 2**(1/2), 1/2**(1/2)]",
                        help="python list of scales (reference flag format)")
    parser.add_argument("--matching-method", default="L2",
                        help="L2 | PQ | ANNOY | HNSW | PQ_HNSW | IVFPQ | LSH")
    parser.add_argument("--opq", nargs="?", const=True, default=False,
                        choices=[True, False, "refine"],
                        help="learned orthogonal pre-rotation for PQ-family "
                             "indexes (OPQ, Ge et al. CVPR'13); '--opq' "
                             "rotates all code levels, '--opq refine' rotates "
                             "only the residual level (PQ_HNSW: keeps coarse-"
                             "code dedup)")
    parser.add_argument("--refine-m", type=int, default=None, metavar="BYTES",
                        help="second-level refinement codes per vector for "
                             "PQ_HNSW / IVFPQ (IVFADC+R): enables the "
                             "codes-only adc+refine re-rank; default = "
                             "backend default (PQ_HNSW 32, IVFPQ 0)")
    parser.add_argument("--ifgenerate", action="store_true",
                        help="(re)build index artifacts instead of loading")
    parser.add_argument("--outputs", default="outputs")
    parser.add_argument("--batch-size", type=int, default=16)
    return parser


def parse_scales(expr: str) -> Sequence[float]:
    return tuple(float(s) for s in eval(expr, {"__builtins__": {}}))  # noqa: S307


def dispatch_matcher(method: str, *args, **kwargs):
    from ..index.matchers import MATCHERS

    if method not in MATCHERS:
        raise SystemExit(
            f"unknown matching method {method!r}; have {sorted(MATCHERS)}"
        )
    return MATCHERS[method](*args, **kwargs)
