"""Reusable column-expression libraries: vector math, text metrics, and
multimodal (binary payload) helpers."""
