"""coupled subpackage."""
