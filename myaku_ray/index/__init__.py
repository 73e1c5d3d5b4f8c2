"""Inverted-index storage + query: codec, segments, block-max WAND."""
