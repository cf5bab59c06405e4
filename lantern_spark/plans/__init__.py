"""Plan inspection and contracts."""
