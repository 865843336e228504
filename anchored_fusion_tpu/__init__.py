"""anchored_fusion_tpu — a TPU-native anchored gene-fusion detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ShenLab-Genomics/Anchored-Fusion (reference: /root/reference).  The reference
pipeline shells out to bwa/BLAT/samtools/bedtools for every alignment stage and
clusters reads in pure Python; here the whole compute path runs as fixed-shape
device arrays on TPU:

  * ``ops``       — Pallas/XLA kernels: one-hot diagonal seeding on the MXU,
                    Kadane maximal-segment scan, banded affine-gap
                    Smith–Waterman, segment/PWM scatter ops.
  * ``align``     — the unified seed-extend engine with per-stage sensitivity
                    presets replacing ``bwa mem`` and all six BLAT passes.
  * ``index``     — k-mer seed indexes (replicated anchored transcript,
                    shardable genome).
  * ``annotate``  — GTF exon interval index, exon-walk windows, homolog mask.
  * ``call``      — block clustering, breakpoint clustering, PWM consensus,
                    candidate validation, report writing.
  * ``models``    — the false-positive filter family (CNN+Transformer, bi-LSTM,
                    SVM) in Flax/optax, plus training-data builders.
  * ``parallel``  — device mesh setup, sharded alignment, collective evidence
                    merge (psum/all_gather over ICI/DCN).
  * ``io``        — FASTQ/FASTA/GTF/SAM codecs producing packed int8 arrays.
  * ``cli``       — bulk and single-cell drivers mirroring the reference CLIs.
  * ``bench``     — read simulator, downsampler, throughput/scaling harness.
"""

__version__ = "0.1.0"

from anchored_fusion_tpu.config import PipelineConfig  # noqa: F401
