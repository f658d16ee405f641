"""CLI entrypoint: ``python -m movement_spark.cli task <Name> [-c conf] [-s k=v]``.

Mirrors the reference CLI surface (cli/.../CLI.java:91-108): a task name,
a properties file, and ``-s key=value`` overrides layered on top
(ConfigUtil.withOverrides analog). Designed for
``spark-submit --py-files movement_spark.zip movement_spark/cli.py ...``
on a real cluster; locally it builds its own session.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_props(path: str) -> dict[str, str]:
    conf: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            conf[k.strip()] = v.strip()
    return conf


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="movement_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("task", help="run a named job")
    t.add_argument("name")
    t.add_argument("-c", "--config", help="properties file")
    t.add_argument("-s", "--set", action="append", default=[],
                   metavar="K=V", help="config override (repeatable)")

    sub.add_parser("list-tasks", help="list known jobs")
    sub.add_parser("list-queries", help="list registered queries")

    args = ap.parse_args(argv)

    from movement_spark.jobs import JOBS, run_job

    if args.cmd == "list-tasks":
        for name in sorted(JOBS):
            print(name)
        return 0
    if args.cmd == "list-queries":
        from movement_spark import queries as Q
        for name in sorted(Q.queries()):
            print(name)
        return 0

    conf = parse_props(args.config) if args.config else {}
    for kv in args.set:
        if "=" not in kv:
            ap.error(f"-s expects K=V, got {kv!r}")
        k, v = kv.split("=", 1)
        conf[k] = v
    result = run_job(args.name, **conf)
    print(json.dumps({
        "task": result.name,
        "status": result.status,
        "elapsed_sec": round(result.elapsed_sec, 3),
        "metrics": result.metrics,
    }))
    return 0 if result.status == "SUCCEEDED" else 1


if __name__ == "__main__":
    sys.exit(main())
