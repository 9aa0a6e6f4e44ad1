"""Basic retrieval driver: extract, score, evaluate.

Counterpart of ``python -m src.main_retrieve``
(``/root/reference/src/main_retrieve.py``): extract database + query
descriptors for standard (revisited) or folder-labelled datasets, rank with a
matcher, and print the protocol mAP. (The reference's ``--deep-quantization``
branch is dead code — its Soft_PQ import is broken, SURVEY.md section 2; the
working deep-PQ path here is ``ops.softpq`` + ``matching_PQ_Net``.)
"""

from __future__ import annotations

import argparse

from .benchmark import main as benchmark_main
from .test_custom import main as custom_main


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["revisited", "custom"], default="revisited")
    return p


def main(argv=None):
    argv = list(argv or [])
    args, rest = build_parser().parse_known_args(argv)
    if args.mode == "custom":
        return custom_main(rest)
    return benchmark_main(rest)


if __name__ == "__main__":
    raise SystemExit(main())
