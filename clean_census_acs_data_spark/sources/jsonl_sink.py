"""Dead-letter export sink as a registered Spark 4 Python DataSource
WRITER — the write-side twin of the census_rest reader
(census_datasource.py), completing the custom-connector surface.

Why a custom sink: dead-letter rows (sources/rest.py
split_dead_letters) need to reach ops tooling that speaks line-JSON —
an export format Spark's built-in writers don't produce as one file
per partition with task-commit semantics. The DataSourceWriter API
gives exactly the two-phase contract a real external sink (webhook,
queue, warehouse bulk-loader) needs:

- ``write(iterator)`` runs per partition on executors, staging a file
  named by (task partition id, attempt-unique uuid) — attempts never
  collide;
- ``commit(messages)`` runs once on the driver after ALL tasks
  succeed, atomically renaming staged files into place and dropping a
  ``_SUCCESS`` manifest listing them;
- ``abort()`` leaves only staged temp files (never visible to
  readers), which a re-run overwrites.

The same shape plugs in any at-least-once external system; replace the
rename with the external commit call.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType


@dataclass
class _Staged(WriterCommitMessage):
    staged_path: str
    final_name: str
    n_rows: int


class JsonlDeadLetterWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> _Staged:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"._staged-{pid}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {k: row[k] for k in self.fields}
                fh.write(json.dumps(rec, ensure_ascii=False, default=str) + "\n")
                n += 1
        return _Staged(staged_path=staged, final_name=f"part-{pid:05d}.jsonl", n_rows=n)

    def commit(self, messages) -> None:
        manifest = []
        for m in messages:
            final = os.path.join(self.path, m.final_name)
            os.replace(m.staged_path, final)
            manifest.append({"file": m.final_name, "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            json.dump({"files": manifest}, fh)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged_path)
            except FileNotFoundError:
                pass


class JsonlDeadLetterSink(DataSource):
    """df.write.format("jsonl_deadletter").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_deadletter"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlDeadLetterWriter:
        return JsonlDeadLetterWriter(schema, dict(self.options), overwrite)


def register_jsonl_sink(spark) -> None:
    # active-session-pinned + idempotent: see
    # session.register_python_datasource for the clone-routing bug
    from clean_census_acs_data_spark.session import register_python_datasource

    register_python_datasource(spark, JsonlDeadLetterSink)
