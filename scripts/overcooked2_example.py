"""Overcooked2 ("simplecooked") benchmark/validation CLI
(reference: scripts/overcooked2_example.py)."""

from overcooked_example import overcooked_main

if __name__ == "__main__":
    overcooked_main("v2")
