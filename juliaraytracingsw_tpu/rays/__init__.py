"""rays subpackage."""
