"""Batch/stream readers and the event-envelope codec."""
