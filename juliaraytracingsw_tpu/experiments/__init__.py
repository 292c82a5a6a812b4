"""Runnable experiment entry points (the reference's *Main.jl layer).

``python -m juliaraytracingsw_tpu.experiments <name> [--flag value ...]``

Replaces the reference's include-chain + Parameters.jl file-swap convention
(SURVEY.md §2.5) with argparse subcommands over the typed configs.
"""
