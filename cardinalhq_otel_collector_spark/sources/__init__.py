"""Sources & sinks: table catalog + testdata loaders."""
