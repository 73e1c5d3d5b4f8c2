"""Checkpoint / lineage records for resumable index builds."""
