"""Command-line interface (reference cli/main.py:8-106, typer-based;
rebuilt on argparse — typer is not available in this environment).

Commands:
    lambdapic-tpu autoreload <script.py>   hot-reload a running simulation
    lambdapic-tpu timer-stat <log>         aggregate TIMER log entries
    lambdapic-tpu qed-tables               (re)generate the QED tables
    lambdapic-tpu batch                    stub (reference cli/main.py batch)
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="lambdapic-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_auto = sub.add_parser("autoreload",
                            help="run a script, restart on edit/crash")
    p_auto.add_argument("script")
    p_auto.add_argument("--exit-on-error", action="store_true")
    p_auto.add_argument("--exit-on-finish", action="store_true")

    p_stat = sub.add_parser("timer-stat", help="aggregate TIMER log entries")
    p_stat.add_argument("logfile")

    sub.add_parser("qed-tables", help="generate QED optical-depth tables")

    p_batch = sub.add_parser("batch", help="batch runner (stub, like the "
                                           "reference cli/main.py)")
    p_batch.add_argument("args", nargs="*")

    args = parser.parse_args(argv)

    if args.command == "timer-stat":
        from .stat import print_stats
        print_stats(args.logfile)
    elif args.command == "autoreload":
        from .auto_reload import AutoReload
        from pathlib import Path
        AutoReload(Path(args.script), exit_on_error=args.exit_on_error,
                   exit_on_finish=args.exit_on_finish).run()
    elif args.command == "qed-tables":
        from ..models.qed_tables import TABLE_PATH, table_gen
        print(f"generating -> {TABLE_PATH}")
        table_gen()
    elif args.command == "batch":
        print("batch mode is not implemented (stub, as in the reference)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
