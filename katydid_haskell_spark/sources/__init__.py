"""Sources: synthetic corpus generators + testdata loaders."""
