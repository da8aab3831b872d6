"""Abstract visual reasoning evaluation (arXiv 1905.12506).

TPU-native, runnable rebuild of ``evaluation/abstract_reasoning/`` — the
one reference subsystem that was vestigial there (its TF1/tensorflow_hub
imports don't resolve in the shipped env, ``evaluation/evaluate.py:40-42``).
PGM generation is host numpy; the WildRelNet reasoning model is flax with a
single jitted train step.
"""

from encdiff_tpu.evalx.abstract_reasoning.pgm import PGM, PGMDesign
from encdiff_tpu.evalx.abstract_reasoning.pgm_data import (
    PGMDataset, PGMInstance, Quantizer, get_pgm_dataset)
from encdiff_tpu.evalx.abstract_reasoning.reason import reason

__all__ = ["PGM", "PGMDesign", "PGMDataset", "PGMInstance", "Quantizer",
           "get_pgm_dataset", "reason"]
