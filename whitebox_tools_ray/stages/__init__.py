"""Ray Data batch transforms — each stage is a function Dataset → Dataset."""
