"""Source connectors: crawl-archive container formats -> pages tables."""
