"""CLI entry point — the presto-cli analogue (reference: presto-cli speaks
/v1/statement; SURVEY.md §3.2).

Usage:
  python -m presto_ads_spark "SELECT count(*) FROM lineitem"
  echo "SELECT 1" | python -m presto_ads_spark
  python -m presto_ads_spark --serve [port]     # start the HTTP API

Reads SQL from argv or stdin, prints the result as aligned text (or JSON
lines with --json). Tables from $SPARK_GRAFT_SF_DIR are pre-registered.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    as_json = "--json" in argv
    serve = "--serve" in argv

    from .catalog import DEFAULT_SF_DIR
    from .engine import Engine

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    eng = Engine(sf_dir=sf_dir if os.path.isdir(sf_dir) else None)
    eng.spark.sparkContext.setLogLevel("ERROR")

    if serve:
        from .server import StatementServer

        port = int(args[0]) if args else 8080
        server = StatementServer(eng, port=port)
        server.start()
        print(f"listening on http://{server.host}:{server.port}/v1/statement")
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            server.stop()
        return 0

    sql = args[0] if args else sys.stdin.read()
    if not sql.strip():
        print("usage: python -m presto_ads_spark 'SELECT ...'", file=sys.stderr)
        return 2
    df = eng.sql(sql)
    rows = df.collect()
    if as_json:
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        cols = df.columns
        widths = [
            max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c)
            for c in cols
        ]
        print(" | ".join(c.ljust(w) for c, w in zip(cols, widths)))
        print("-+-".join("-" * w for w in widths))
        for r in rows:
            print(" | ".join(str(r[c]).ljust(w) for c, w in zip(cols, widths)))
        print(f"({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
