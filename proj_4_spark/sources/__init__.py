"""Sources: page-table synthesis, coordinate mining, table loaders."""
