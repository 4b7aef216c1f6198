"""Dataflow plans — each reference "query" as a lazy DataFrame pipeline."""
