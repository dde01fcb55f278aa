package graft.queries

import graft.Q

/** Aggregates every query suite into the driver-facing registry. */
object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Pipeline.queries ++ Cef.queries
}
