"""End-to-end query plans: flagship spatial pipeline + relational coverage."""
