"""Interactive SQL shell with metaqueries — the reference's interactive
client surface (reference: internal/metaquery/definitions.go:24-128,
internal/interactive/interactive_client.go:346-347).

Metaqueries:
  .tables                 list tables with row/file stats (.inspect alias)
  .inspect [table]        table detail: columns, partitions, stats
  .output csv|json|table  result format
  .header on|off          CSV header toggle
  .separator <ch>         CSV separator
  .clear                  clear screen
  .exit / .quit           leave

Everything else is executed as Spark SQL over the registered views.
Designed to be drivable programmatically (``Shell.handle`` returns the
rendered string) so the acceptance tests exercise the same path a human
types into.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from tailpipe_spark.catalog import Catalog
from tailpipe_spark.cli import render


class Shell:
    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog
        self.output = "table"
        self.header = True
        self.separator = ","
        self.catalog.register_views(spark)

    # --- metaquery dispatch (reference: metaquery/handlers.go:14-22) ---
    def handle(self, line: str) -> str:
        line = line.strip()
        if not line:
            return ""
        if line.startswith("."):
            return self._metaquery(line)
        try:
            df = self.spark.sql(line.rstrip(";"))
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0]
            if "TABLE_OR_VIEW_NOT_FOUND" in msg:
                return "Error: no data has been collected for this table yet"
            return f"Error: {msg}"
        return render(df, self.output, header=self.header, separator=self.separator)

    def _metaquery(self, line: str) -> str:
        parts = line.split()
        cmd, args = parts[0].lower(), parts[1:]
        if cmd in (".exit", ".quit"):
            raise EOFError
        if cmd == ".clear":
            return "\033[2J\033[H"
        if cmd == ".output":
            if args and args[0] in ("csv", "json", "table"):
                self.output = args[0]
                return f"output format: {self.output}"
            return "usage: .output csv|json|table"
        if cmd == ".header":
            if args and args[0] in ("on", "off"):
                self.header = args[0] == "on"
                return f"header: {args[0]}"
            return "usage: .header on|off"
        if cmd == ".separator":
            if args:
                self.separator = args[0]
                return f"separator: {self.separator!r}"
            return "usage: .separator <char>"
        if cmd in (".tables", ".inspect"):
            if cmd == ".inspect" and args:
                return self._inspect_table(args[0])
            lines = []
            for t in self.catalog.list_tables():
                s = self.catalog.file_stats(t)
                lines.append(f"{t}\t{s['rows']} rows\t{s['files']} files\t{s['bytes']} bytes")
            return "\n".join(lines) if lines else "(no tables)"
        return f"unknown metaquery {cmd!r} (try .tables .inspect .output .header .separator .exit)"

    def _inspect_table(self, table: str) -> str:
        """Reference: internal/metaquery/handler_inspect.go:17-75."""
        try:
            schema = self.catalog.table_schema(table)
        except KeyError:
            return f"Error: table {table!r} not found"
        s = self.catalog.file_stats(table)
        from tailpipe_spark.compact import enumerate_partition_keys

        keys = enumerate_partition_keys(self.catalog, table)
        parts = sorted({k.tp_partition for k in keys})
        lines = [f"table: {table}", f"rows: {s['rows']}  files: {s['files']}  bytes: {s['bytes']}"]
        lines.append("columns:")
        lines += [f"  {c}: {t}" for c, t in schema.items()]
        lines.append(f"partitions: {', '.join(parts) if parts else '(none)'}")
        return "\n".join(lines)

    def repl(self) -> None:  # pragma: no cover — interactive loop
        print("tailpipe-spark shell — .exit to quit, .tables to list")
        buf: list[str] = []
        while True:
            try:
                prompt = "...> " if buf else "tp> "
                line = input(prompt)
            except (EOFError, KeyboardInterrupt):
                print()
                return
            buf.append(line)
            # multi-line statements end with ';' (metaqueries are single-line)
            if not line.strip().startswith(".") and not line.rstrip().endswith(";") and line.strip():
                continue
            stmt = "\n".join(buf)
            buf = []
            try:
                out = self.handle(stmt)
            except EOFError:
                return
            if out:
                print(out)


def main(argv: list[str] | None = None) -> int:  # pragma: no cover
    import argparse

    from tailpipe_spark.session import build_session

    ap = argparse.ArgumentParser(prog="tailpipe-spark-shell")
    ap.add_argument("--workspace", default="./workspace")
    args = ap.parse_args(argv)
    spark = build_session("tailpipe-shell")
    Shell(spark, Catalog(args.workspace)).repl()
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
