"""The unified seed-extend alignment engine (replaces bwa mem + all BLAT passes)."""

from anchored_fusion_tpu.align.aligner import (  # noqa: F401
    AlignmentResult, align_to_reference, classify_clips,
)
