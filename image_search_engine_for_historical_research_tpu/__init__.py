"""TPU-native image-search engine for historical research.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
YYao-42/Image-Search-Engine-for-Historical-Research:

- ``ops``        -- numeric kernels: pooling (MAC/SPoC/GeM/R-MAC), normalization,
                    losses, whitening, streaming top-k, PQ/k-means primitives.
- ``models``     -- Flax ResNet101 + SOA (SOLAR) descriptor model and extraction.
- ``index``      -- search backends (flat, PQ, IVF-PQ, HNSW-graph, RP-forest) with a
                    uniform ``build``/``search`` contract and pickle-free artifacts.
- ``rerank``     -- alphaQE / AQE / DBA query expansion, kNN-graph diffusion,
                    k-reciprocal re-ranking.
- ``parallel``   -- device-mesh sharding helpers and sharded top-k merge.
- ``data``       -- dataset configs, image loading, feature store.
- ``evaluation`` -- revisited-Oxford/Paris mAP protocol (the golden metric).
- ``train``      -- tuple mining + contrastive training loop.
- ``serving``    -- online query service (stdlib WSGI).

The canonical array conventions (everywhere, unlike the reference's mixed D x N /
N x D): images are NHWC, descriptor matrices are row-major ``(num_images, dim)``,
rank matrices are ``(num_queries, k)``. Reference semantics are cited per-module as
``/root/reference/src/<file>:<line>``.
"""

__version__ = "0.1.0"

# Short, convenient alias used throughout docs/tests:  `import
# image_search_engine_for_historical_research_tpu as isehr`.
