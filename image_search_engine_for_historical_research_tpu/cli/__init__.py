"""Command-line drivers mirroring the reference's entry points.

- ``offline``    — build feature store + index artifacts (src/offline.py)
- ``online``     — query service over WSGI (src/online.py)
- ``benchmark``  — revisited rOx/rPar (+1M) protocol runs (src/test_rOP1m.py)
- ``extract_1m`` — resumable distractor extraction (src/extract_1m.py)
- ``test_custom``— folder-label mAP evaluation (src/test_custom.py)
- ``train``      — tuple training with hard-negative mining (src/main_train.py)
"""
