"""Experiment-sweep bookkeeping — reference ``src/util/variants.py``:
the offline x online optimizer-variant grid."""
import itertools

variants_offline = list(range(0, 10))
variants_online = list(range(0, 7))

variants = list(itertools.product(variants_offline, variants_online))
