"""Persistent lookup tables for the SumoQL ``save`` / ``lookup`` verbs.

Sumo's lookup tables outlive a query: ``save <table>`` materializes a
result into a lookup others reference later (and ``save <table>
append`` adds rows to an existing one) — the reference provisions the
same tables through the content/API layer.  The in-memory ``lookups``
dict ``compile_query`` accepts is session-scoped; this registry is the
durable form: a dict-compatible object backed by a parquet directory,
so it drops into every existing ``lookups=`` parameter unchanged.

Semantics:

* ``save <name>`` → overwrite the stored table with the frame's rows
  (an eager write — ``save`` is an output operator, the one stage that
  runs a job at compile time; documented Sumo behavior, not a quirk).
* ``save <name> append`` → append rows (Sumo's merge option).
* ``lookup … from <name>`` → resolves from memory first, then from
  disk (``__missing__``/``__contains__``), always broadcast-joined —
  lookup tables are dimension-sized by contract.

100 TB stance: a lookup table is small by definition (it broadcasts);
the store does one parquet write per save and one read per first use.
Nothing here touches the fact-table path.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .sumoql import SumoQLError


class PersistentLookups(dict):
    """Dict-compatible lookup registry over ``root`` (one parquet
    dataset per table).  Pass as ``compile_query(..., lookups=store)``;
    the ``save`` stage detects the ``save`` method and persists."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        super().__init__()
        self._spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # A crash between write-to-tmp and the rename in save() leaves a
        # `<name>.__tmp__` directory.  It is harmless — tables() filters
        # it out and the next save() of that name rmtree's it before
        # writing — and an init-time sweep here would be UNSAFE: another
        # live registry on the same root may be mid-save into its tmp
        # dir, and constructing a registry must stay read-only.

    def _path(self, name: str) -> str:
        if not re.fullmatch(r"\w+", name):
            raise SumoQLError(f"bad lookup table name {name!r}")
        return os.path.join(self.root, name)

    def save(self, name: str, df: DataFrame, append: bool = False) -> None:
        path = self._path(name)
        if append and not os.path.isdir(path):
            # Appending to a table that doesn't exist yet creates it —
            # matches Sumo's save-with-merge on a fresh table.
            append = False
        if append:
            df.write.mode("append").parquet(path)
        else:
            # Overwrite via write-to-tmp + swap, for two reasons: the
            # refresh pattern `… lookup … from t | … | save t` READS the
            # path being overwritten (Spark refuses an in-place
            # overwrite-while-reading), and a mid-write failure must not
            # destroy the existing table.
            import shutil

            tmp = path + ".__tmp__"
            shutil.rmtree(tmp, ignore_errors=True)
            df.write.mode("overwrite").parquet(tmp)
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
        # Re-read so the cached frame reflects the post-write state.
        dict.__setitem__(self, name, self._spark.read.parquet(path))

    def tables(self) -> list[str]:
        # Only \w+ names are loadable (_path rejects the rest), so a
        # stray directory — e.g. a crash-leftover `<name>.__tmp__` —
        # must not be listed as a table.
        on_disk = [d for d in os.listdir(self.root)
                   if re.fullmatch(r"\w+", d)
                   and os.path.isdir(os.path.join(self.root, d))]
        return sorted(set(on_disk) | set(self.keys()))

    def __contains__(self, name: object) -> bool:  # `in` skips __missing__
        return dict.__contains__(self, name) or (
            isinstance(name, str) and re.fullmatch(r"\w+", name) is not None
            and os.path.isdir(os.path.join(self.root, name))
        )

    def __missing__(self, name: str) -> DataFrame:
        path = self._path(name)
        if not os.path.isdir(path):
            raise KeyError(name)
        df = self._spark.read.parquet(path)
        dict.__setitem__(self, name, df)
        return df
