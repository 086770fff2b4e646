"""Drop-in support package (reference whoosh/support/)."""
