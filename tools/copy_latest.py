#!/usr/bin/env python3
"""Harvest the latest checkpoint/diagnostics file from each run directory.

Same capabilities as the reference's tools/copy_latest.py:13-46: renames the
file after its run directory, supports an explicit --count, and a --groups
option copying only selected HDF5 groups (via h5py instead of shelling out
to h5copy).
"""

import argparse
import os
import shutil

import h5py


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directories", nargs="+")
    parser.add_argument("--destination", "-d", default=".")
    parser.add_argument("--prefix", default="chkpt")
    parser.add_argument("--count", default=None, type=int)
    parser.add_argument("--groups", default=None)
    args = parser.parse_args()

    os.makedirs(args.destination, exist_ok=True)
    out_prefix = "" if args.prefix == "chkpt" else ".diagnostics"

    for directory in args.directories:
        if not os.path.isdir(directory):
            continue
        files = sorted(f for f in os.listdir(directory)
                       if f.startswith(args.prefix))
        if not files:
            continue
        old_name = files[-1] if args.count is None else files[args.count]
        run_name = os.path.split(os.path.normpath(directory))[-1]
        new_name = old_name.replace(args.prefix, run_name + out_prefix)
        src = os.path.join(directory, old_name)
        dst = os.path.join(args.destination, new_name)

        if args.groups:
            with h5py.File(src, "r") as fin, h5py.File(dst, "a") as fout:
                for group in args.groups.split(","):
                    print(f"h5 copy {src}:/{group} -> {dst}:/{group}")
                    if group in fout:
                        del fout[group]
                    fin.copy(group, fout)
        else:
            print(f"cp {src} {dst}")
            shutil.copyfile(src, dst)


if __name__ == "__main__":
    main()
