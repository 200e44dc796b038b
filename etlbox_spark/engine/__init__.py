from .checkpoint import Checkpoint
from .lake import BUCKET_COL, ConcurrentCommitError, LakeTable, Manifest
from .merge import (
    ACTION_COL,
    MergeResult,
    apply_epoch,
    classify,
    dedupe_lww,
    evolve_schema,
    read_changes,
    read_maintenance_changes,
    read_quarantine,
)
from .runner import replay
from .spec import ChangeAction, MergeMode, MergeSpec

__all__ = [
    "ACTION_COL",
    "BUCKET_COL",
    "ChangeAction",
    "Checkpoint",
    "ConcurrentCommitError",
    "LakeTable",
    "Manifest",
    "MergeMode",
    "MergeResult",
    "MergeSpec",
    "apply_epoch",
    "classify",
    "dedupe_lww",
    "evolve_schema",
    "read_changes",
    "read_maintenance_changes",
    "read_quarantine",
    "replay",
]
