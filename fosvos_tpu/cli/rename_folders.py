"""One-off experiment-dir renaming utility — reference
``src/playground/rename_folders.py`` (strips a given prefix from result
folder names; the reference hardcoded 'min_'-prefixed power-of-2 variants).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--base-dir', required=True, type=str)
    parser.add_argument('--prefix', default='offline_min_', type=str)
    parser.add_argument('--dry-run', action='store_true')
    args = parser.parse_args(argv)

    base = Path(args.base_dir)
    for p in sorted(base.iterdir()):
        if p.is_dir() and p.name.startswith(args.prefix):
            target = p.with_name(p.name[len(args.prefix):])
            print(f'{p} -> {target}')
            if not args.dry_run:
                p.rename(target)


if __name__ == '__main__':
    main()
