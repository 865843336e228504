"""Device kernels: encoding, diagonal seeding, Kadane scan, banded SW, PWM ops."""

from anchored_fusion_tpu.ops.encode import (  # noqa: F401
    BASE_A, BASE_C, BASE_G, BASE_T, BASE_N, PAD,
    encode_ascii, decode_to_str, revcomp, one_hot,
)
