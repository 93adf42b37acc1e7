"""Interactive SQL shell with metaqueries — the reference's interactive
client surface (reference: internal/metaquery/definitions.go:24-128,
internal/interactive/interactive_client.go:346-347).

Metaqueries (same set as the reference):
  .help                   list metaqueries
  .tables                 list tables with row/file stats
  .inspect [table]        table detail: columns, partitions, stats
  .output csv|json|table|line   result format
  .headers on|off         column header toggle (.header alias)
  .separator <ch>         CSV separator
  .multi on|off           multiline mode (statements end with ';')
  .autocomplete on|off    tab-completion toggle
  .clear                  clear screen
  .exit / .quit           leave

Everything else is executed as Spark SQL over the registered views.
Designed to be drivable programmatically (``Shell.handle`` returns the
rendered string) so the acceptance tests exercise the same path a human
types into. Query history persists to the workspace metadata dir and
feeds readline; ``Shell.complete`` powers tab-completion over
metaqueries, table names, and column names.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession

from tailpipe_spark.catalog import Catalog
from tailpipe_spark.cli import render

_METAQUERIES: dict[str, str] = {
    ".help": "Show help on metaqueries",
    ".tables": "List tables",
    ".inspect": "View tables & column information",
    ".output": "Set output format: csv, json, table or line",
    ".headers": "Enable or disable column headers",
    ".separator": "Set csv output separator",
    ".timing": "Enable or disable query execution time display",
    ".multi": "Enable or disable multiline mode",
    ".autocomplete": "Enable or disable auto-completion",
    ".clear": "Clear the console",
    ".exit": "Exit from the terminal",
    ".quit": "Exit from the terminal",
}

_HISTORY_LIMIT = 500


class Shell:
    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog
        self.output = "table"
        self.header = True
        self.separator = ","
        self.timing = False
        self.multiline = False
        self.autocomplete = True
        self.history: list[str] = []
        self._history_path = os.path.join(
            catalog.metadata_dir, "shell_history.json"
        )
        self._load_history()
        self.catalog.register_views(spark)
        # live reload: another process collecting into this workspace
        # updates the manifest; the next statement sees the new tables
        # (reference: internal/file_watcher/connection_watcher.go —
        # fsnotify there, an interaction-boundary mtime poll here)
        from tailpipe_spark.watcher import FileWatcher

        self._watcher = FileWatcher([catalog.manifest_path])

    # --- history (persisted per workspace) ---
    def _load_history(self) -> None:
        if os.path.exists(self._history_path):
            try:
                with open(self._history_path) as f:
                    self.history = list(json.load(f))[-_HISTORY_LIMIT:]
            except (OSError, ValueError):
                self.history = []

    def _save_history(self) -> None:
        try:
            with open(self._history_path, "w") as f:
                json.dump(self.history[-_HISTORY_LIMIT:], f)
        except OSError:
            pass

    # --- completion (metaqueries, tables, columns) ---
    def complete(self, prefix: str) -> list[str]:
        """Candidates for the token ``prefix`` — drives tab-completion
        (reference: interactive_client.go autocomplete suggestions)."""
        if not self.autocomplete:
            return []
        if prefix.startswith("."):
            return sorted(m for m in _METAQUERIES if m.startswith(prefix))
        # one manifest read per call (readline invokes complete()
        # repeatedly per TAB press — per-table schema loads would be
        # dozens of JSON parses per keystroke)
        cands: set[str] = set()
        for t, cols in self.catalog.table_schemas().items():
            cands.add(t)
            cands.update(cols)
        low = prefix.lower()
        return sorted(c for c in cands if c.lower().startswith(low))

    # --- metaquery dispatch (reference: metaquery/handlers.go:14-22) ---
    def handle(self, line: str) -> str:
        line = line.strip()
        if not line:
            return ""
        self.history.append(line)
        self._save_history()
        if self._watcher.changed():
            self.catalog.register_views(self.spark)
        if line.startswith("."):
            return self._metaquery(line)
        return self._run_sql(line)

    #: job-group id every shell query runs under, so Ctrl-C can cancel
    #: exactly the in-flight work and nothing else on a shared cluster
    JOB_GROUP = "tailpipe-shell"

    def _run_sql(self, line: str) -> str:
        """Execute SQL under a cancellable job group with optional
        timing (reference: interactive_client_cancel.go — Ctrl-C
        cancels the in-flight query, the prompt survives; timing per
        internal/interactive/query_history.go `.timing`)."""
        import time

        sc = self.spark.sparkContext
        t0 = time.perf_counter()
        sc.setJobGroup(self.JOB_GROUP, line[:100], interruptOnCancel=True)
        try:
            df = self.spark.sql(line.rstrip(";"))
            out = render(
                df, self.output, header=self.header, separator=self.separator
            )
        except KeyboardInterrupt:
            # the Spark jobs keep running server-side after the Python
            # interrupt — cancel the group so executors stop too
            sc.cancelJobGroup(self.JOB_GROUP)
            return "Query cancelled"
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0]
            if "TABLE_OR_VIEW_NOT_FOUND" in msg:
                return "Error: no data has been collected for this table yet"
            return f"Error: {msg}"
        if self.timing:
            out += f"\nTime: {time.perf_counter() - t0:.3f}s"
        return out

    def _on_off(self, cmd: str, args: list[str], attr: str) -> str:
        if args and args[0] in ("on", "off"):
            setattr(self, attr, args[0] == "on")
            return f"{cmd.lstrip('.')}: {args[0]}"
        return f"usage: {cmd} on|off"

    def _metaquery(self, line: str) -> str:
        parts = line.split()
        cmd, args = parts[0].lower(), parts[1:]
        if cmd in (".exit", ".quit"):
            raise EOFError
        if cmd == ".help":
            w = max(len(m) for m in _METAQUERIES)
            return "\n".join(
                f"{m.ljust(w)}  {d}" for m, d in sorted(_METAQUERIES.items())
            )
        if cmd == ".clear":
            return "\033[2J\033[H"
        if cmd == ".output":
            if args and args[0] in ("csv", "json", "table", "line"):
                self.output = args[0]
                return f"output format: {self.output}"
            return "usage: .output csv|json|table|line"
        if cmd in (".header", ".headers"):
            return self._on_off(".headers", args, "header")
        if cmd == ".timing":
            return self._on_off(".timing", args, "timing")
        if cmd == ".multi":
            return self._on_off(".multi", args, "multiline")
        if cmd == ".autocomplete":
            return self._on_off(".autocomplete", args, "autocomplete")
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
        return (
            f"unknown metaquery {cmd!r} (try "
            + " ".join(sorted(_METAQUERIES))
            + ")"
        )

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
        print("tailpipe-spark shell — .exit to quit, .help for metaqueries")
        try:
            import readline

            for h in self.history:
                readline.add_history(h)

            def _rl_complete(text, state):
                cands = self.complete(text)
                return cands[state] if state < len(cands) else None

            readline.set_completer(_rl_complete)
            readline.parse_and_bind("tab: complete")
        except ImportError:
            pass
        buf: list[str] = []
        while True:
            try:
                prompt = "...> " if buf else "tp> "
                line = input(prompt)
            except KeyboardInterrupt:
                # Ctrl-C at the prompt abandons the buffered statement
                # but keeps the shell alive (reference behavior —
                # interactive_client_cancel.go); .exit/Ctrl-D leave
                print()
                buf = []
                continue
            except EOFError:
                print()
                return
            # a metaquery typed mid-statement dispatches ON ITS OWN and
            # preserves the SQL buffer (the user can .output/.help/.exit
            # without losing or mangling the statement in progress)
            if line.strip().startswith("."):
                try:
                    out = self.handle(line)
                except EOFError:
                    return
                if out:
                    print(out)
                continue
            if not line.strip() and not buf:
                continue
            buf.append(line)
            # in multiline mode statements end with ';'
            if self.multiline and not line.rstrip().endswith(";"):
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
