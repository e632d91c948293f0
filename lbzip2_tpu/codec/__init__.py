"""Production device-accelerated codec."""
