"""Serving demos.

Reference: accessory/demos/ — gradio web UIs (single_turn.py,
single_turn_mm.py, multi_turn.py, multi_turn_mm*.py) plus CLI demos, with a
rank-0 UI broadcasting requests to model-parallel workers.

TPU build: gradio isn't available in this image, so the web demo is a
dependency-free stdlib HTTP server (demos/server.py — JSON + SSE streaming);
the interactive terminal demo is demos/cli.py. The reference's worker
broadcast loop is unnecessary: one process drives the whole GSPMD mesh.
"""
