"""Physical-plan helpers: Hilbert range partitioning, deterministic skew
salting, and checkpoint/lineage persistence for resumable stages."""

from .salting import hot_keys, salted_join  # noqa: F401
from .checkpoints import (  # noqa: F401
    CHECKPOINT_SCHEMA,
    completed_units,
    resume_filter,
    write_stage_checkpoint,
)
