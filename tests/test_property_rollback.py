"""Property-based rollback/replay convergence (hypothesis): ANY
interleaving of "replay up to epoch K" and "rollback to the snapshot
after epoch J" must leave the table equal to the pure-Python oracle of
the event prefix 0..J, and a final full re-replay — reusing the SAME
checkpoint file across the whole script, stale entries and all — must
converge to the straight-through oracle. Exercises the epoch-marker
revert, the fast_resume gate (checkpoint ∩ manifest markers), and
version retention under repeated rollback/re-apply cycles.

Spark jobs are slow per example, so few, fat examples; derandomize so a
pass is a pass forever (the engine is deterministic in the events).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlbox_spark.engine import Checkpoint, LakeTable, MergeMode, MergeSpec, replay
from etlbox_spark.engine.gen import gen_events, write_events

from .conftest import REPO_FILES_SCHEMA

N_EPOCHS = 4

# a script step: replay through epoch `upto`, then roll back to the
# snapshot after epoch `back` (back <= upto by construction)
_step = st.integers(min_value=0, max_value=N_EPOCHS - 1).flatmap(
    lambda upto: st.tuples(st.just(upto), st.integers(min_value=0, max_value=upto))
)


def _prefix_oracles(ev_dir: str) -> list[dict]:
    """oracles[i] = pure-Python state after replaying epochs 0..i."""
    state: dict = {}
    out = []
    for e in range(N_EPOCHS):
        pdf = pd.read_parquet(f"{ev_dir}/epoch={e}").sort_values("event_seq")
        for r in pdf.itertuples():
            k = (r.repo, r.path)
            if r.op == "delete":
                state.pop(k, None)
            else:
                state[k] = r.content
        out.append(dict(state))
    return out


def _snap(spark, t):
    return {(r.repo, r.path): r.content for r in t.read(spark).collect()}


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=st.lists(_step, min_size=1, max_size=3))
def test_rollback_replay_interleavings_converge(spark, tmp_path_factory, script):
    tmp_path = tmp_path_factory.mktemp("prb")
    ev_dir = str(tmp_path / "events")
    write_events(
        gen_events(spark, n_events=1200, n_repos=10, paths_per_repo=30, epoch_size=300),
        ev_dir,
    )
    oracles = _prefix_oracles(ev_dir)
    t = LakeTable.create(str(tmp_path / "lake"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    spec = MergeSpec()
    ck = Checkpoint(str(tmp_path / "c.json"))

    versions: dict[int, int] = {}  # epoch -> snapshot version, last application
    state_epoch = -1  # table currently equals oracle prefix through this epoch
    for upto, back in script:
        if upto > state_epoch:
            res = replay(
                spark, t, ev_dir, spec, MergeMode.DELTA,
                checkpoint=ck, epochs=list(range(upto + 1)),
            )
            for r in res:
                if not r.skipped:
                    versions[r.epoch_id] = r.version
            state_epoch = upto
        t.rollback(versions[back])
        state_epoch = back
        assert t.manifest().committed_epochs == list(range(back + 1))
        assert _snap(spark, t) == oracles[back]

    # final full re-replay with the same (stale) checkpoint converges
    res = replay(spark, t, ev_dir, spec, MergeMode.DELTA, checkpoint=ck)
    assert [r.skipped for r in res[: state_epoch + 1]] == [True] * (state_epoch + 1)
    assert _snap(spark, t) == oracles[-1]
