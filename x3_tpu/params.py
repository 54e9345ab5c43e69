"""Codec parameters as a frozen (hashable, jit-static) dataclass.

Mirrors the reference's `Parameters` struct with validation
(/root/reference/src/x3.rs:81-134): block length, blocks per frame, the three
Rice code selections and their switching thresholds.  Instances are immutable
and hashable so they can be passed as static arguments to jitted functions.
"""

from __future__ import annotations

import dataclasses

from . import constants
from .errors import InvalidEncodingThresh


@dataclasses.dataclass(frozen=True)
class Parameters:
    block_len: int = constants.DEFAULT_BLOCK_LENGTH
    blocks_per_frame: int = constants.DEFAULT_BLOCKS_PER_FRAME
    codes: tuple = constants.DEFAULT_RICE_CODES
    thresholds: tuple = constants.DEFAULT_THRESHOLDS

    def __post_init__(self):
        object.__setattr__(self, "codes", tuple(self.codes))
        object.__setattr__(self, "thresholds", tuple(self.thresholds))
        # Validation per x3.rs:107-112: the first two thresholds must not
        # exceed the offset of their selected Rice code table.
        rice = self.rice_codes
        for k in range(2):
            if self.thresholds[k] > rice[k].offset:
                raise InvalidEncodingThresh(
                    f"threshold[{k}]={self.thresholds[k]} exceeds Rice code "
                    f"offset {rice[k].offset}"
                )

    @property
    def rice_codes(self):
        return constants.get_rice_codes(self.codes)

    @property
    def samples_per_frame(self) -> int:
        return self.block_len * self.blocks_per_frame


@dataclasses.dataclass(frozen=True)
class X3aSpec:
    """Archive-level stream spec (reference: x3.rs:70-79)."""

    sample_rate: int
    params: Parameters
    channels: int = 1
