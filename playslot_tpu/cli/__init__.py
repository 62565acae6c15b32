"""CLI entry points mirroring the reference's numbered pipeline scripts."""
