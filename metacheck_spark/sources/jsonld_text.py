"""VERBATIM OUTPUT-TEXT CONSTANTS from the reference implementation —
data, not logic.

These are the exact strings the reference EMITS in its JSON-LD assessment
documents and analysis summary (process descriptions, suggestion texts,
indicator categories, and the summary's own description wording):
json_ld_utils.py:54-88 (process), :313-354 (categories), :402-436
(suggestions), detect_pitfalls_main.py:62-253 (summary shell). They are
reproduced character-for-character because the engine's output documents
are verified byte-equivalent against the reference's generated documents
(tests/test_jsonld_parity.py) — any paraphrase would be an output
difference, not a style choice. All document-ASSEMBLY logic lives in
sources/jsonld.py and is original Spark expression code.
"""

DESCRIPTIONS = {
    "P001": "The metadata file (codemeta or other) has a version which does not correspond to the version used in the latest release",
    "P002": "LICENSE file contains template placeholders like <program>, <year>, <name of author> that were not replaced",
    "W003": "The metadata file (codemeta or other) Software requirements don't have version specifications",
    "W004": "codemeta.json dateModified is outdated compared to the actual repository last update date",
    "P005": "The metadata file (codemeta or other) have multiple authors in single field instead of a list",
    "P006": "In codemeta.json README property pointing to their homepage/wiki instead of README file",
    "P007": "codemeta.json referencePublication refers to software archive instead of paper",
    "P008": "The metadata file (codemeta or other) has License pointing to a local file instead of stating the name",
    "W010": "Programming languages in codemeta.json do not have versions",
    "P011": "CITATION.cff does not have referencePublication even though it's referenced in codemeta.json",
    "W012": "The metadata file (codemeta or other) softwareRequirements have more than one req, but it's written as one string",
    "P013": "The metadata file (codemeta or other) softwareRequirement points to an invalid page",
    "W014": "codemeta.json Identifier is a name instead of a valid unique identifier, but an identifier exist",
    "W015": "codemeta.json Identifier is empty",
    "P016": "The metadata file (codemeta or other) coderepository points to their homepage",
    "P017": "LICENSE file only contains copyright information without actual license terms",
    "P018": "codemeta.json IssueTracker violates the expected URL format",
    "P019": "codemeta.json downloadURL is outdated",
    "P020": "codemeta.json developmentStatus is a URL instead of a string",
    "W021": "The metadata file (codemeta or other) GivenName is a list instead of a string",
    "P022": "The metadata file (codemeta or other) License does not have the specific version",
    "P023": "The metadata file (codemeta or other) codeRepository uses Git remote-style shorthand instead of full URL",
    "P024": "codemeta.json uses bare DOIs in the identifier field instead of full https://doi.org/ URL",
    "P025": "In codemeta.json contIntegration link returns 404",
    "P026": "The metadata file (codemeta or other) codeRepository does not point to the same repository",
    "P027": "codemeta.json version does not match the package's",
    "P028": "codemeta.json Identifier uses raw SWHIDs without their resolvable URL",
}

CATEGORIES = {
    "P001": "metadatafile", "P002": "license", "W003": "metadatafile",
    "W004": "codemeta", "P005": "metadatafile", "P006": "codemeta",
    "P007": "codemeta", "P008": "metadatafile", "W010": "codemeta",
    "P011": "codemeta", "W012": "metadatafile", "P013": "metadatafile",
    "W014": "codemeta", "W015": "codemeta", "P016": "metadatafile",
    "P017": "license", "P018": "codemeta", "P019": "codemeta",
    "P020": "codemeta", "W021": "metadatafile", "P022": "metadatafile",
    "P023": "metadatafile", "P024": "codemeta", "P025": "codemeta",
    "P026": "metadatafile", "P027": "codemeta", "P028": "codemeta",
}

SUGGESTIONS = {
    "P001": "Ensure the version in your metadata matches the latest official release. Keeping these synchronized avoids confusion for users and improves reproducibility.",
    "P002": "Update the copyright section with accurate names, organizations, and the current year. Personalizing this section ensures clarity and legal accuracy.",
    "W003": "Add version numbers to your dependencies. This provides stability for users and allows reproducibility across different environments.",
    "W004": "You need to align the version in your metadata file with your latest release tag. Automating this synchronization as part of your release process is highly recommended.",
    "P005": "You should separate multiple authors into a structured list. This allows tools and citation systems to correctly identify and credit each contributor.",
    "P006": "Update the README property so it points directly to your actual README file instead of your homepage. This helps ensure users and automated tools can access your project documentation easily.",
    "P007": "Standardize your version format across files using semantic versioning (for example, 1.2.0) or any standardized versioning scheme. Consistent versioning reduces confusion for users and systems.",
    "P008": "You need to replace local file paths with recognized SPDX license identifiers, such as MIT or GPL-3.0-only in URL form. This ensures your license can be correctly detected by automated tools.",
    "W010": "List all applicable licenses if your repository includes more than one. This avoids confusion about terms of use and ensures full transparency.",
    "P011": "Include version numbers for each programming language used. Defining these helps ensure reproducibility and compatibility across systems.",
    "W012": "Add a referencePublication field with the related DOI or citation entry to your CITATION.cff. This will help link your work to its scholarly references.",
    "P013": "Rewrite your dependencies as a proper list, with each item separated and preferably with their versions. This makes them easier to parse for metadata systems.",
    "W014": "Verify and update any dependency links to ensure they lead to valid and accessible pages.",
    "W015": "You should replace plain name in your identifier field with persistent identifiers, such as DOIs or SWHIDs, to improve discoverability and interoperability.",
    "P016": "You need to update the codeRepository field to point directly to your repository's source code instead of a homepage. Accurate links improve traceability and user access.",
    "P017": "You need to include the complete text of a recognized license such as MIT, Apache 2.0, or GPL. A full license clarifies rights and usage conditions for others",
    "P018": "You need to correct the issue tracker URL so it follows a valid format, such as https://github.com/user/repo/issues. Proper links help users engage with your development process.",
    "P019": "You need to update the downloadURL field to point to your latest release or current distribution source. Outdated links can mislead users or cause failed installations.",
    "P020": "You need to replace URLs in the developmentStatus field with descriptive text values, such as 'active', 'beta', or 'stable'. This maintains schema compliance and clarity.",
    "W021": "Ensure givenName is a single string per person. This ensures that every author is properly credited and can be extracted automatically ",
    "P022": "You should declare the specific version of the license using a recognized SPDX identifier. For example, use 'GPL-3.0-only' or 'GPL-2.0-or-later' instead of simply 'GPL'",
    "P023": "You should replace the remote-style syntax with a full web-accessible URL (e.g., https://github.com/user/repo).",
    "P024": "You should include the full DOI URL form in your metadata (e.g., https://doi.org/XX.XXXX/zenodo.XXXX)",
    "P025": "You need to update the outdated URLs to point to the current CI platform, or remove the property if no active CI is in place. A good pratcie would be to periodically test all external links, especially those related to CI or build status.",
    "P026": "Make sure that the codeRepository URL in your metadata exactly matches the repository hosting your source code.",
    "P027": "You need to synchronize all version references across metadata and build configuration files.",
    "P028": "Always use the full resolvable SWHID URL (e.g., https://archive.softwareheritage.org/swh:1:dir:abcd.../). This will ensures that both humans and machines can access the archived software snapshot directly",
}

SUMMARY_DESCRIPTIONS = {
    "P001": "The metadata file (codemeta or other) has a version which does not correspond to the version used in the latest release",
    "P002": "LICENSE file contains template placeholders like <program>, <year>, <name of author> that were not replaced",
    "W003": "Software requirements in metadata files don't have version specifications",
    "W004": "The dateModified in codemeta.json is outdated compared to the actual repository last update date",
    "P005": "Metadata files have multiple authors in single field instead of a list",
    "P006": "In codemeta.json README property pointing to their homepage/wiki instead of README file",
    "P007": "codemeta.json referencePublication refers to software archive instead of paper",
    "P008": "The metadata file has License pointing to a local file instead of stating the name",
    "W010": "Programming languages in codemeta.json do not have versions",
    "P011": "CITATION.cff does not have referencePublication even though it's referenced in codemeta.json",
    "W012": "The metadata file softwareRequirements have more than one req, but it's written as one string",
    "P013": "The metadata file softwareRequirement points to an invalid page",
    "W014": "codemeta.json Identifier is a name instead of a valid unique identifier, but an identifier exist",
    "W015": "codemeta.json Identifier is empty",
    "P016": "The metadata file coderepository points to their homepage",
    "P017": "LICENSE file only contains copyright information without actual license terms",
    "P018": "codemeta.json IssueTracker violates the expected URL format",
    "P019": "codemeta.json downloadURL is outdated",
    "P020": "codemeta.json developmentStatus is a URL instead of a string",
    "W021": "The metadata file GivenName is a list instead of a string",
    "P022": "The metadata file License does not have the specific version",
    "P023": "The metadata file codeRepository uses Git remote-style shorthand instead of full URL",
    "P024": "codemeta.json uses bare DOIs in the identifier field instead of full https://doi.org/ URL",
    "P025": "In codemeta.json contIntegration link returns 404",
    "P026": "The metadata file codeRepository does not point to the same repository",
    "P027": "codemeta.json version does not match the package's",
    "P028": "codemeta.json Identifier uses raw SWHIDs without their resolvable URL",
}

# detect_pitfalls_main.py:262-289 order — checks appear in this order
CODES = [
    "P001", "P002", "W003", "W004", "P005", "P006", "P007", "P008", "W010",
    "P011", "W012", "P013", "W014", "W015", "P016", "P017", "P018", "P019",
    "P020", "W021", "P022", "P023", "P024", "P025", "P026", "P027", "P028",
]
