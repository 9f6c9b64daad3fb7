"""CLI: ``python -m ever_tpu create <path>`` scaffolds a project
(parity: ``ever/__main__.py:6-11``; argparse instead of python-fire)."""

import argparse

from ever_tpu.util._main import create_project


def create(path: str) -> None:
    """Reference spelling (``ever/__main__.py:6-11`` exposes ``create`` via
    python-fire)."""
    create_project(path)


def main():
    parser = argparse.ArgumentParser(prog='ever_tpu')
    sub = parser.add_subparsers(dest='cmd', required=True)
    c = sub.add_parser('create', help='scaffold a new project')
    c.add_argument('path')
    args = parser.parse_args()
    if args.cmd == 'create':
        create_project(args.path)


if __name__ == '__main__':
    main()
