"""Typed configuration for the whole pipeline.

The reference scatters dozens of magic numbers through ``functions.py`` (clip
minimum 15 at functions.py:923/:928, merge window 3 at :851, identity 0.9 at
:828/:859/:1229, block gap 200 at :450/:464, exon slack 10 at :73, spanning
trim 5 at :387, same-chrom distance 2000 at :409, candidate dedup window 200 at
:1226, read-imbalance 10x at :1770, filter thresholds 0.1/0.9 at :1786-1791,
...).  Every one of them is surfaced here as a named, documented field so the
TPU pipeline is tunable and the parity contract is explicit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """Scoring and shape parameters of the seed-extend engine.

    Match/mismatch follow bwa-mem's defaults (A=1, B=4); gap open/extend follow
    bwa's -O6 -E1.  The reference relies on bwa-mem soft-clip boundaries
    (SURVEY §7.3 item 2); the diagonal+Kadane extension reproduces them for
    ungapped segments and the banded-SW refiner covers indel-containing reads.
    """

    match_score: int = 1
    mismatch_penalty: int = 4
    gap_open: int = 6
    gap_extend: int = 1
    # Max padded read length (101bp reads -> 128 lanes).
    max_read_len: int = 128
    # Minimum seeding score (diagonal match count) to consider a diagonal.
    min_diag_matches: int = 14
    # Number of top diagonals extended per read per strand.
    top_diagonals: int = 4
    # Half-width of the banded-SW refinement band.
    band_half_width: int = 16
    # Minimum alignment score to report (bwa mem -T is 30).
    min_align_score: int = 30
    # Minimum length of a reported M-segment.
    min_seg_len: int = 20
    # Read-position sampling stride of the dense diagonal seeder (the MXU
    # analogue of blat -stepSize; extension always runs full-resolution).
    seed_stride: int = 1
    # k-mer size for genome-scale seeding.  Size the bucket table to O(1)
    # positions per bucket: mean load = L / (4^k * index_stride).  The
    # default 13 is right up to ~0.5Gbp; at hg38/stride-8 it leaves 5.8
    # positions/bucket so the H cap truncates most buckets, while k=14
    # (+0.75GiB of table) drops the load to 1.45 and made H=4 exact-recall
    # at 1.63x the H=8 throughput (docs/HG38_BENCH.json round 5) — set 14
    # for multi-Gbp genomes.
    genome_kmer: int = 13
    # Gapped (affine SW) refinement post-pass on both production aligners:
    # bridges indels the ungapped Kadane extension splits, recovering
    # bwa-parity soft-clip boundaries (functions.py:669-683 relies on bwa
    # emitting I/D ops).  The suspicious-minority selection keeps the pass
    # off the hot path.
    gapped_refine: bool = True
    # Max seed hits per k-mer kept (repeat masking, ~bwa -c / blat repMatch).
    # The seed-hit gather is the genome stage's HBM-bound hot loop: its cost
    # is linear in this cap (H=16 is 3.2x faster than H=64 end-to-end), and
    # seeds with more hits carry little placement information anyway — bwa
    # skips high-occurrence seeds entirely.  Default 8, adopted from the
    # recall-vs-H sweeps (bench/hg_scale.py; docs/PERFORMANCE.md): recall
    # outside segmental duplications is 1.0000 at H∈{8,16,32} on BOTH the
    # 32MB flat truth set (41.2k vs 34.6k reads/s) and the full 3.1Gbp
    # sharded run (6.5k vs 3.7k reads/s) — H=8 costs nothing and buys
    # 1.2-1.7x on the genome stage.
    max_hits_per_kmer: int = 8
    # Genome index build-side sampling stride (BLAT tiles its target at
    # stepSize=tileSize; bwa samples its suffix array 1/32).  1 = index every
    # position (default, maximal sensitivity).  s>1 shrinks the sorted index
    # s-fold — the enabler for hg38-scale single-chip residency — and the
    # READ side then samples densely (genome_query_stride auto-drops to 1),
    # which tightens the guaranteed-seed window to k+s-1 bp (vs k+q-1 for the
    # dense-index/strided-query default).
    index_stride: int = 1
    # Read-side k-mer sampling stride for genome seeding.  0 = auto:
    # k//2 when the index is dense (index_stride=1), else 1 (dense queries
    # against a sparse index — every genome k-mer hit is still reachable).
    genome_query_stride: int = 0
    # Single-device shard routing: each read's full seeding+extension runs
    # only on its ``shard_route_top`` most-promising shards, ranked by a
    # cheap per-shard seed-evidence prepass (H-capped bucket sizes from two
    # table gathers — no position gather, no sort).  0 = OFF (default, and
    # the right setting on this runtime): measured on a 0.25Gbp/3-shard
    # index, per-shard device compute is ~0.1ms/2048 reads while every
    # result pull costs a ~70-100ms relay round trip, so skipping shards
    # saves nothing and the extra prepass/subset round trips COST 1.4x
    # (9.3k -> 6.7k reads/s) — and the count prepass mis-ranks ~0.5-2.5% of
    # unique-region reads at genome-scale k-mer load factors (docs/
    # PERFORMANCE.md round 4).  Available for compute-bound deployments
    # (local chips, no relay) where S/route x less extension work wins.
    # Mesh (multi-chip) runs ignore this: shards already run in parallel.
    shard_route_top: int = 0

    # Two-pass XL seeding (the hg38 throughput knob, GenomeAlignerXL only):
    # pass 1 seeds every read with a reduced hit cap and top-k
    # (xl_pass1_hits/xl_pass1_top_k — the H=4 point is 1.56x faster, its
    # recall loss is exactly the reads whose true position falls outside a
    # crowded bucket's first H genome-ordered slots and therefore SCORES LOW
    # on extension), then reads failing the confidence gate — best score <
    # xl_confident_frac x read_len or segment below min_seg_len — re-seed at
    # xl_rescue_hits with the full top-k.  A confidently-placed read needs a
    # near-perfect (>= frac x len) match, which outside segmental
    # duplications only the true locus provides, so the gate is recall-safe
    # where truth-position recall is defined; measured at 3.1 Gbp / H-cap
    # sweep in docs/HG38_BENCH.json.  OFF by default: two-pass results are
    # not bit-identical to the flat aligner for rescued reads' second_score,
    # and the parity suite pins the single-pass path.  (Query-side k-mer
    # subsampling — VERDICT r5's first-listed lever — is structurally unsafe
    # against a strided index: a query stride q with gcd(q, index_stride)>1
    # makes reads at odd offsets lose EVERY seed, and coprime strides cut
    # true-diagonal votes to ~R/lcm(q,s) ~ 4, under the decoy noise floor.)
    # Defaults are the repeat-robust point from the 3.1Gbp family sweep
    # (docs/HG38_BENCH.json round5_families): pass-1 at H=4/top-4 keeps the
    # true copy's bucket entries for copy-number<=16 families (H=2 drops
    # them and reads get confidently mis-placed on low-divergence windows
    # the gate cannot see), recall_family 0.9717 vs 0.9155-0.9517 for the
    # narrower configs, recall_unique 1.0 everywhere.  The throughput point
    # (pass1_hits=2, pass1_top_k=2, rescue 8: 25.2k reads/s, the fastest
    # exact-unique-recall config) is the right setting for repeat-light
    # genomes.
    xl_two_pass: bool = False
    xl_pass1_hits: int = 4
    xl_pass1_top_k: int = 4
    xl_rescue_hits: int = 16
    # Rescue extends the top-8 voted diagonals (vs top_diagonals=4 on the
    # fast path): a read from one copy of a high-copy repeat family shares
    # ~2/3 of its k-mers with every other copy, so several decoy diagonals
    # can out-vote the true one — extending more of them lets the SCORE
    # (which only the true copy maximizes) decide.  Rescue is a few percent
    # of reads, so the wider extension is ~free.
    xl_rescue_top_k: int = 8
    # 0.90: a read placed on the WRONG copy of a 3%-diverged repeat family
    # scores ~len - 5*0.03*len ~ 0.85*len, so the gate must sit above that
    # for the rescue pass to re-seed it (copies <=2% diverged score within
    # the gate and are inherently ambiguous at single-read scale — bwa
    # gives them mapq 0 too); ordinary reads with <=2 errors still clear it.
    xl_confident_frac: float = 0.90

    def resolved_query_stride(self) -> int:
        if self.genome_query_stride:
            return self.genome_query_stride
        return max(1, self.genome_kmer // 2) if self.index_stride == 1 else 1


@dataclasses.dataclass(frozen=True)
class StagePreset:
    """Sensitivity preset for one re-alignment/validation stage.

    The reference runs six BLAT passes with stage-specific knobs
    (functions.py:341, :530, :966, :1007, :1122, :1244, :1522); each maps to
    one named preset consumed by the same engine.  ``step`` is the dense
    seeder's read-position sampling stride (the MXU analogue of blat
    -stepSize); blat's k-mer size has no counterpart in the dense all-diagonal
    seeder (it is k-mer-free, full sensitivity at any k), and its -maxGap is
    structurally satisfied (the extension engine is ungapped; indels go
    through the SW refiner).
    """

    name: str
    min_score: int
    min_identity: float
    step: int = 1
    # Minimum aligned segment length a hit must reach to count at this stage
    # (0 = engine default).  blat has no direct flag for this; stages that
    # consume clip-side hits bound it by the min clip length they accept.
    min_seg_len: int = 0


# blat -stepSize=3 -repMatch=10000 -minScore=50 -minIdentity=80 (functions.py:341)
HOMOLOG_PRESET = StagePreset("homolog", min_score=50, min_identity=0.80, step=3)
# blat -minScore=20 and NO identity flag (functions.py:530); default blat
# stepSize is tileSize=11 but fine-block queries are short reads — keep
# full-resolution seeding.  min_seg_len=15 mirrors the stage's own floor:
# only clips >= min_clip_len (15, functions.py:923/:928) reach it, so a
# shorter genome hit can never explain a surviving clip.
FINE_BLOCK_PRESET = StagePreset("fine_block", min_score=20, min_identity=0.0,
                                step=1, min_seg_len=15)
# blat -stepSize=3 -minScore=20 -minMatch=2 -minIdentity=0 (functions.py:966)
CANDIDATE_LEAK_PRESET = StagePreset("candidate_leak", min_score=20, min_identity=0.0, step=3)
# blat -stepSize=3 -minScore=12 -minMatch=2 -minIdentity=90 (functions.py:1007,:1071,:1122)
ANCHORED_SPLIT_PRESET = StagePreset("anchored_split", min_score=12, min_identity=0.90, step=3)
# blat -stepSize=3 -minScore=20 -minMatch=3 -minIdentity=90 (functions.py:1244)
JUNCTION_LINEARITY_PRESET = StagePreset("junction_linearity", min_score=20, min_identity=0.90, step=3)
# blat -stepSize=3 -minScore=0.8*read_len -minMatch=3 -minIdentity=90 -maxGap=1
# (functions.py:1517-1522); min_score is resolved at runtime from modal read length.
NEGATIVE_LINEARITY_PRESET = StagePreset("negative_linearity", min_score=0, min_identity=0.90, step=3)


@dataclasses.dataclass(frozen=True)
class CallConfig:
    """Fusion-calling thresholds (exact parity with the reference heuristics)."""

    # Soft-clip length below which a split read is ignored (functions.py:923,:928).
    min_clip_len: int = 15
    # Breakpoint clusters <= this many bp apart are merge candidates (functions.py:851).
    breakpoint_merge_window: int = 3
    # Positional-identity threshold for cluster merging (functions.py:828,:859,:1229).
    merge_identity: float = 0.9
    # Exon-aware block merge gap in exonic bp (functions.py:450,:464,:484).
    block_merge_gap: int = 200
    # Exonic expansion of blocks after merging (functions.py:492-495).
    block_expand: int = 200
    # Candidate region flanking pad in bp (functions.py:961-962).
    candidate_pad: int = 100
    # Spanning M-run trimmed by this many bp on each side (functions.py:387).
    spanning_trim: int = 5
    # Same-chromosome mate pairs closer than this are not spanning evidence
    # (functions.py:409).
    min_spanning_distance: int = 2000
    # +-slack allowed in exon containment queries (functions.py:73-84).
    exon_slack: int = 10
    # PSL hits must touch a consensus end within this slack (functions.py:1016-1017).
    end_touch_slack: int = 5
    # Splice-extension trigger: breakpoint within this many bp of an exon edge
    # (functions.py:1029,:1039,:1050,:1060).
    splice_edge_window: int = 11
    # Anchor-side consensus must match >= this fraction of its length
    # (functions.py:1129-1131).
    anchor_consensus_identity: float = 0.9
    # Candidate dedup looks back over this many most-recent candidates
    # (functions.py:1226).
    candidate_dedup_window: int = 200
    # Multi-mapper rescue: M-run overlap fraction on both flanks (functions.py:751-756).
    rescue_overlap_frac: float = 0.2
    # Spanning/split rebalance trigger ratio (functions.py:1314).
    rebalance_ratio: int = 3
    # Report: drop candidates with >= this x read-count imbalance (functions.py:1770).
    report_imbalance: int = 10
    # Filter verdict thresholds (functions.py:1786-1791).
    score_low: float = 0.1
    score_high: float = 0.9
    # Candidate genome hits longer than this are ignored in fine blocks
    # (functions.py:630).
    fine_block_max_span: int = 200
    # PSL boundary slack used throughout Find_fine_block (functions.py:633-648).
    fine_block_slack: int = 5


@dataclasses.dataclass(frozen=True)
class FilterModelConfig:
    """Hyper-parameters of the CNN+Transformer filter (Model.py:283-298)."""

    input_dim: int = 6
    block_dim: int = 256
    embed_dim: int = 256
    class_dim: int = 256
    window: int = 3
    maxpool_dim: int = 3
    class_shrink_dim: int = 4
    transformer_dim: int = 128
    transformer_heads: int = 2
    transformer_layers: int = 1
    # torch nn.TransformerEncoderLayer default feed-forward width.
    transformer_ff: int = 2048
    num_class: int = 2
    dropout: float = 0.2
    len_seq: int = 201
    # Training (Model.py:283-298)
    batch_size: int = 256
    learning_rate: float = 1e-4
    num_epochs: int = 30
    train_frac: float = 0.7
    # Deep-supervision loss mixing (Model.py:287 Loss(0.5, 0.5)).
    a1: float = 0.5
    a2: float = 0.5
    # Head temperatures (Model.py:126-130).
    aux_temperature: float = 0.25
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: data-parallel read batches x genome-shard axis.

    Consumed by FusionPipeline: dp shards every alignment read batch, the
    shard axis splits the genome k-mer index (parallel.sharded_genome).  The
    default (1, 1) is the identity case — single-device, no mesh; set
    dp_size=-1 to take all available devices (divided by shard_size).
    """

    dp_axis: str = "dp"
    shard_axis: str = "mp"
    dp_size: int = 1   # -1: all devices / shard_size
    shard_size: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    align: AlignConfig = dataclasses.field(default_factory=AlignConfig)
    call: CallConfig = dataclasses.field(default_factory=CallConfig)
    filter_model: FilterModelConfig = dataclasses.field(default_factory=FilterModelConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # Batch of reads processed per device step.  Each device dispatch costs
    # ~22ms through the axon relay, so bigger batches win until the seeding
    # matrix (B x (L+R)) presses on HBM; 32768 x a transcript-sized reference
    # is ~450MB bf16 (well within one v5e chip), and a typical targeted
    # sample's anchored stage becomes a single dispatch.
    read_batch: int = 32768
    # Run the DL false-positive filter (reference --not_filter_false_positive inverts).
    filter_false_positive: bool = True
    # Train the filter on input data (reference --not_train_filter_model inverts).
    train_filter_model: bool = True
    model_file: Optional[str] = None
    # bfloat16 one-hot seeding matmuls (f32 accumulation on MXU).
    seed_dtype: str = "bfloat16"


DEFAULT_CONFIG = PipelineConfig()
