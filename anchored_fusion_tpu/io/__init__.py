"""Host-side codecs: FASTQ/FASTA/GTF/SAM <-> packed int8 arrays."""

from anchored_fusion_tpu.io.fasta import read_fasta, Reference  # noqa: F401
from anchored_fusion_tpu.io.fastq import read_fastq_pair, ReadBatch  # noqa: F401
