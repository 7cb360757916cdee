"""Command-line tools (the framework's util/ equivalent)."""
