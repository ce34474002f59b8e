#!/usr/bin/env python3
"""Tutorial 1: runtime configuration.

The narrative analog of the reference's tutorial/tut1.cpp: how to use the
framework's runtime configuration structures,

- mara3_tpu.app.config.ConfigTemplate
- argv_to_string_map
- Config

Run it: ``python tutorial/tut1.py resolution=2048 outdir=elsewhere``.
"""

import sys

from mara3_tpu.app.config import Config, ConfigTemplate, argv_to_string_map

# Step 1: create an empty template.
template = ConfigTemplate()

# Step 2: populate it with names and typed defaults. The template is
# immutable: each .item() returns a new copy (exactly like the reference's
# config_template_t).
template = (template
            .item("resolution", 1024)
            .item("tfinal", 10.0)
            .item("outdir", "my_data"))

# Step 3: create an immutable Config holding the defaults.
cfg = template.create()
assert cfg.get_int("resolution") == 1024
assert cfg.get_double("tfinal") == 10.0
assert cfg.get_string("outdir") == "my_data"

# Step 4: update from 'key=value' command-line arguments. String values are
# coerced to the declared types; unknown keys and wrong types raise.
args = argv_to_string_map(sys.argv[1:])
cfg = cfg.update(args)

try:
    cfg.set("not_a_parameter", 1)
except KeyError as e:
    print(f"as expected: {e}")

try:
    cfg.set("resolution", "not_a_number")
except TypeError as e:
    print(f"as expected: {e}")

# Step 5: pretty-print the banner the subprograms show at startup.
cfg.pretty_print()

# Restart precedence (used by every subprogram): template defaults
# <- checkpoint's run_config group <- CLI overrides. See
# mara3_tpu.app.driver.create_run_config.
print("tutorial 1 finished")
