"""Genome annotation: exon interval index, exon-walk windows, homolog masking."""

from anchored_fusion_tpu.annotate.exon_index import ExonIndex  # noqa: F401
from anchored_fusion_tpu.annotate.exon_walk import find_positions  # noqa: F401
