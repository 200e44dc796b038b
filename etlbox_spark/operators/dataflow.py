"""Dataflow-graph facade — ETLBox's `LinkTo` / `Network.Execute()` UX
(SURVEY.md §3.1 EP1) over lazy DataFrames.

In ETLBox the user wires components (`source.LinkTo(transform)
.LinkTo(dest)`, predicates for routing, `Multicast` for fan-out) and then
executes the whole graph once. In Spark the graph *is* the lazy logical
plan; what this facade adds is the same ergonomics — fluent wiring,
predicate routing, fan-out, multiple sinks — with a single `execute()`
that runs every registered sink action. Sinks on the same upstream share
one plan, so Catalyst sees the full graph and shuffle-stage reuse (not a
cache) de-duplicates work across sink jobs, exactly like the merge core.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame


class Network:
    """Collects sink actions; ``execute()`` runs them all (the
    `Network.Execute(...)` analog) and returns their results in
    registration order."""

    def __init__(self) -> None:
        self._sinks: list[tuple[str, Callable[[], Any]]] = []

    def add(self, name: str, action: Callable[[], Any]) -> None:
        # the results dict cannot represent two sinks under one name —
        # a silent last-wins would run both actions but LOSE the first
        # result (and an auto-generated "sink_N" could collide with an
        # explicit name of the same spelling)
        if any(name == n for n, _ in self._sinks):
            raise ValueError(f"duplicate sink name {name!r}")
        self._sinks.append((name, action))

    def execute(self) -> dict[str, Any]:
        return {name: action() for name, action in self._sinks}


class Pipe:
    """One edge of the dataflow graph (wraps a lazy DataFrame).

    ``link`` = ETLBox `LinkTo(component)`: a DataFrame→DataFrame
    transformation, with an optional row predicate applied first (the
    link-predicate routing idiom). ``split`` = if/else routing to two
    pipes; ``multicast`` = `Multicast` fan-out (same lazy plan, N
    consumers). ``to`` registers a sink action on the shared Network.
    """

    def __init__(self, df: DataFrame, network: Network | None = None):
        self.df = df
        self.network = network or Network()

    def link(
        self,
        fn: Callable[[DataFrame], DataFrame] | None = None,
        predicate: Column | None = None,
    ) -> "Pipe":
        df = self.df if predicate is None else self.df.where(predicate)
        return Pipe(fn(df) if fn is not None else df, self.network)

    def where(self, predicate: Column) -> "Pipe":
        return Pipe(self.df.where(predicate), self.network)

    def split(self, predicate: Column) -> tuple["Pipe", "Pipe"]:
        from .branch import conditional_split

        hit, miss = conditional_split(self.df, predicate)
        return Pipe(hit, self.network), Pipe(miss, self.network)

    def link_error_to(self, checks) -> tuple["Pipe", "Pipe"]:
        """ETLBox ``LinkErrorTo`` analog: returns (good, errors) pipes;
        ``checks`` is a list of (fails_when, reason) — see
        operators/errors.py for the declared-failure-condition idiom."""
        from .errors import route_errors

        good, bad = route_errors(self.df, checks)
        return Pipe(good, self.network), Pipe(bad, self.network)

    def multicast(self, n: int) -> list["Pipe"]:
        return [Pipe(self.df, self.network) for _ in range(n)]

    def union(self, *others: "Pipe") -> "Pipe":
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return Pipe(df, self.network)

    def to(self, sink: Callable[[DataFrame], Any], name: str | None = None) -> "Pipe":
        df = self.df
        if name is None:
            taken = {n for n, _ in self.network._sinks}
            i = len(self.network._sinks)
            while f"sink_{i}" in taken:
                i += 1
            name = f"sink_{i}"
        self.network.add(name, lambda: sink(df))
        return self

    def execute(self) -> dict[str, Any]:
        return self.network.execute()
