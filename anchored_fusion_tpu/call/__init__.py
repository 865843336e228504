"""Fusion calling: blocks, breakpoints, consensus, candidates, reporting."""
