#!/usr/bin/env python3
"""Batch / cluster job generation.

Same capability surface as the reference's tools/run_suite.py:61-113: a
*suite file* (python defining `suite`: name, subprog, job_params, mara_opts,
runs) plus a *machine file* (defining `machine`: submit_command,
submit_script template) generate per-run directories containing submit.sh
and a README; --restart regenerates scripts resuming from the latest
checkpoint; --submit launches. The default executable is this framework's
CLI (`python -m mara3_tpu`).
"""

import argparse
import copy
import datetime
import getpass
import os
import pathlib

README_TEMPLATE = """\
User: {user}
Date: {date}

{comment}
"""

DEFAULT_MACHINE = {
    "submit_command": "bash",
    "submit_script": "{command}",
}


def mara_command(subprog, exe="python -m mara3_tpu", **kwargs):
    return "{} {} {}".format(
        exe, subprog, " ".join(f"{k}={v}" for k, v in kwargs.items()))


def run_script(template, subprog, exe="python -m mara3_tpu", runid="test",
               nodes=1, hours=8, **kwargs):
    return template.format(
        nodes=nodes,
        hours=hours,
        job_name=runid,
        output=os.path.join(kwargs.get("outdir", "./"), runid + ".out"),
        command=mara_command(subprog, exe=exe, **kwargs))


def load_pyfile_var(path, var, default=None):
    try:
        defs = {}
        with open(path) as f:
            exec(f.read(), defs)
        return defs[var]
    except Exception:
        if default is not None:
            print("Using the default machine parameters")
            return default
        raise


def latest_checkpoint(directory):
    chkpts = sorted(f for f in os.listdir(directory)
                    if f.startswith("chkpt"))
    return os.path.join(directory, chkpts[-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("suite_file",
                        help="Python file defining a 'suite' variable")
    parser.add_argument("--machine-file", default="machine.py",
                        help="Python file defining a 'machine' variable")
    parser.add_argument("--submit", "-s", action="store_true",
                        help="Also launch jobs")
    parser.add_argument("--quiet", "-q", action="store_true",
                        help="Suppress printing of submit script contents")
    parser.add_argument("--restart", "-r", action="store_true",
                        help="Restart from the latest checkpoint per run")
    args = parser.parse_args()

    suite = load_pyfile_var(args.suite_file, "suite")
    machine = load_pyfile_var(args.machine_file, "machine", DEFAULT_MACHINE)

    for runid in suite["runs"]:
        suite_name = suite.get("name", pathlib.Path(args.suite_file).stem)
        suite_dir = suite.get("root_dir",
                              pathlib.Path(args.suite_file).parent)
        opts = copy.deepcopy(suite.get("mara_opts", dict()))
        run_dir = os.path.join(str(suite_dir), suite_name, runid)
        opts["outdir"] = run_dir

        if args.restart:
            opts["restart"] = latest_checkpoint(run_dir)

        opts.update(suite["runs"][runid])

        submit_content = run_script(
            machine["submit_script"],
            suite["subprog"],
            exe=suite.get("exe", "python -m mara3_tpu"),
            runid=runid,
            nodes=suite["job_params"]["nodes"],
            hours=suite["job_params"]["hours"],
            **opts)

        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "README"), "w") as f:
            f.write(README_TEMPLATE.format(
                date=datetime.datetime.now(), user=getpass.getuser(),
                comment=suite.get("comment", "")))
        with open(os.path.join(run_dir, "submit.sh"), "w") as f:
            f.write(submit_content)

        if not args.quiet:
            print(submit_content)
        if args.submit:
            os.system(machine["submit_command"] + " "
                      + os.path.join(run_dir, "submit.sh"))


if __name__ == "__main__":
    main()
