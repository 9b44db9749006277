"""Every CLI invocation shown in the docs must actually exist.

Parses README.md and docs/MIGRATION.md for ``python -m onet_tpu.run ...``
commands and asserts each subcommand and every ``--flag`` it shows is
accepted by the real argparse tree (run.py::build_parser). Keeps the
switching guide from drifting as the CLI evolves.
"""

import os
import re

from onet_tpu.run import build_parser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ("README.md", "docs/MIGRATION.md", "docs/DEPLOYMENT.md")

CMD_RE = re.compile(r"python -m onet_tpu\.run\s+([a-z0-9-]+)([^\n|`]*)")
FLAG_RE = re.compile(r"--[a-z0-9-]+")


def _documented_commands():
    for doc in DOCS:
        text = open(os.path.join(REPO, doc)).read()
        for m in CMD_RE.finditer(text):
            yield doc, m.group(1), FLAG_RE.findall(m.group(2))


def test_documented_cli_surface_exists():
    parser = build_parser()
    subs = next(a for a in parser._subparsers._group_actions).choices
    seen = 0
    for doc, cmd, flags in _documented_commands():
        assert cmd in subs, f"{doc} documents unknown subcommand '{cmd}'"
        known = set(subs[cmd]._option_string_actions)
        for flag in flags:
            assert flag in known, (
                f"{doc} documents '{cmd} {flag}' but the parser has no "
                f"{flag}")
        seen += 1
    assert seen >= 15, f"doc scan looks broken (only {seen} commands found)"


def test_every_subcommand_is_documented():
    parser = build_parser()
    subs = next(a for a in parser._subparsers._group_actions).choices
    documented = {cmd for _, cmd, _ in _documented_commands()}
    missing = set(subs) - documented - {"bench"}  # bench: `python bench.py`
    assert not missing, f"subcommands absent from the docs: {missing}"
