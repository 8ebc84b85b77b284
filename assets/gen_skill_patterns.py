"""Generate ``assets/skill_patterns.jsonl`` at reference scale.

The reference ships a 2,412-row spaCy EntityRuler pattern file built by
concatenating an English and a Norwegian skill list
(reference assets/get_skills.py:12-21, assets/skills_no_en.jsonl). We
reproduce the SHAPE and SCALE of that asset — same JSONL row format
{"label": "SKILL", "pattern": [{"LOWER": tok}, ...]}, same EN+NO merge
— from public tech vocabulary only (no content is copied from the
reference asset).

The reference file additionally carries a 52-row case-SENSITIVE
stratum of {"TEXT": tok} patterns (acronyms and punctuated names like
".NET", "C++", "C#", "API") which spaCy's EntityRuler matches against
the exact token text. TEXT_SKILLS below mirrors that stratum — 52 rows
of standard public technology names/acronyms in the same attribute
format — so the engine's case-sensitive matching channel
(operators/skills.py) is exercised at reference fidelity.

Deterministic: running this script twice produces identical output.
Usage: python assets/gen_skill_patterns.py
"""

from __future__ import annotations

import json
import os

# --------------------------------------------------------------- EN base

LANGUAGES = """
python java javascript typescript scala kotlin go rust c c++ c# ruby php
swift objective-c r matlab julia perl haskell erlang elixir clojure
groovy lua dart fortran cobol bash powershell sql pl/sql t-sql visual
basic f# ocaml scheme racket solidity zig nim crystal abap sas vba
assembly delphi prolog smalltalk elm purescript reason coffeescript
""".split()

DATA_TOOLS = """
spark hadoop kafka airflow flink beam hive presto trino dbt snowflake
databricks redshift bigquery synapse teradata vertica clickhouse druid
pinot kylin impala drill sqoop oozie luigi dagster prefect nifi
fivetran stitch talend informatica pentaho ssis datastage matillion
debezium kinesis dataflow glue athena emr delta-lake iceberg hudi
parquet avro orc arrow duckdb polars pandas numpy dask ray modin vaex
koalas petl great-expectations soda monte-carlo amundsen datahub atlas
collibra alation looker tableau power-bi qlik superset metabase mode
redash grafana kibana plotly d3 matplotlib seaborn bokeh altair
streamlit gradio excel
""".split()

ML_AI = """
tensorflow pytorch keras scikit-learn xgboost lightgbm catboost mxnet
caffe theano jax onnx huggingface transformers spacy nltk gensim
fasttext word2vec bert gpt llm rag langchain llamaindex openai
anthropic mlflow kubeflow sagemaker vertex-ai automl feature-store
feast tecton opencv yolo detectron pillow torchvision librosa whisper
stable-diffusion gan cnn rnn lstm transformer attention embedding
fine-tuning prompt-engineering vector-database pinecone weaviate
milvus faiss qdrant chroma annoy hnsw pgvector
""".split()

DATABASES = """
postgresql mysql mariadb sqlite oracle sql-server db2 mongodb
cassandra scylla couchbase couchdb dynamodb cosmosdb firestore
bigtable hbase redis memcached elasticsearch opensearch solr lucene
neo4j janusgraph arangodb orientdb influxdb timescaledb questdb
prometheus victoria-metrics etcd zookeeper rabbitmq activemq pulsar
nats sqs sns eventhub
""".split()

CLOUD_DEVOPS = """
aws azure gcp kubernetes docker terraform ansible puppet chef salt
jenkins circleci travis gitlab-ci github-actions argo argocd flux
helm kustomize istio linkerd envoy consul vault nomad packer vagrant
openshift rancher eks aks gke ecs fargate lambda cloud-functions
cloud-run app-engine ec2 s3 rds aurora iam vpc cloudformation cdk
pulumi datadog splunk new-relic sentry pagerduty opsgenie nagios
zabbix cloudwatch stackdriver sre devops finops gitops mlops dataops
ci/cd observability monitoring logging tracing opentelemetry jaeger
zipkin linux ubuntu debian centos rhel alpine windows-server nginx
apache-httpd haproxy cloudflare cdn dns tcp/ip http rest grpc
graphql soap websocket oauth saml sso ldap kerberos tls ssl
""".split()

WEB_APP = """
react angular vue svelte ember backbone jquery node.js deno bun
express fastify nestjs next.js nuxt remix gatsby astro django flask
fastapi pyramid tornado rails sinatra laravel symfony spring
spring-boot micronaut quarkus vertx play akka hibernate jpa mybatis
asp.net .net blazor xamarin maui flutter react-native ionic cordova
electron tauri android ios swiftui jetpack-compose html css sass
less tailwind bootstrap material-ui webpack vite rollup parcel babel
eslint prettier storybook redux mobx zustand rxjs axios pwa
web-components micro-frontends wasm
""".split()

PRACTICES = """
agile scrum kanban lean safe waterfall prince2 pmp itil togaf jira
confluence trello asana notion slack git svn mercurial github gitlab
bitbucket code-review pair-programming tdd bdd ddd solid
microservices event-driven serverless domain-driven-design
design-patterns clean-code refactoring unit-testing integration-testing
e2e-testing selenium cypress playwright puppeteer junit pytest jest
mocha testng cucumber postman soapui load-testing jmeter gatling
locust k6 security penetration-testing owasp gdpr hipaa pci-dss
sox compliance data-governance data-quality data-lineage
data-catalog master-data-management data-modeling dimensional-modeling
star-schema data-vault kimball inmon etl elt data-warehouse data-lake
data-lakehouse data-mesh data-pipeline batch-processing
stream-processing real-time distributed-systems big-data analytics
business-intelligence data-science machine-learning deep-learning
reinforcement-learning nlp computer-vision statistics probability
linear-algebra optimization a/b-testing experimentation forecasting
time-series anomaly-detection recommendation-systems feature-engineering
data-visualization storytelling stakeholder-management communication
leadership mentoring problem-solving critical-thinking teamwork
""".split()

EN_EXTRA_MULTIWORD = [
    "apache spark", "apache kafka", "apache airflow", "apache flink",
    "apache beam", "apache hive", "apache hadoop", "apache cassandra",
    "apache nifi", "apache druid", "apache iceberg", "apache hudi",
    "apache arrow", "apache avro", "apache parquet", "apache superset",
    "apache pulsar", "apache zookeeper", "apache storm", "apache samza",
    "amazon web services", "amazon s3", "amazon redshift",
    "amazon athena", "amazon emr", "amazon kinesis", "amazon dynamodb",
    "amazon sagemaker", "google cloud platform", "google cloud storage",
    "google bigquery", "google dataflow", "google pubsub",
    "google cloud functions", "microsoft azure", "azure data factory",
    "azure synapse", "azure databricks", "azure data lake",
    "azure functions", "azure devops", "sql server", "power bi",
    "power query", "power automate", "delta lake", "data factory",
    "structured streaming", "spark sql", "spark streaming", "pyspark",
    "spark mllib", "pandas api on spark", "hive metastore",
    "unity catalog", "databricks sql", "snowflake cortex",
    "machine learning", "deep learning", "natural language processing",
    "computer vision", "large language models", "generative ai",
    "prompt engineering", "retrieval augmented generation",
    "vector search", "semantic search", "knowledge graphs",
    "graph databases", "relational databases", "nosql databases",
    "columnar storage", "object storage", "message queues",
    "event sourcing", "cqrs", "change data capture", "data contracts",
    "schema registry", "schema evolution", "dimensional modeling",
    "slowly changing dimensions", "medallion architecture",
    "lambda architecture", "kappa architecture", "feature stores",
    "model serving", "model monitoring", "model registry",
    "experiment tracking", "hyperparameter tuning", "transfer learning",
    "self-supervised learning", "federated learning", "edge computing",
    "high availability", "disaster recovery", "capacity planning",
    "cost optimization", "performance tuning", "query optimization",
    "index tuning", "partition pruning", "predicate pushdown",
    "shuffle optimization", "broadcast joins", "skew handling",
    "incremental processing", "idempotent pipelines", "backfilling",
    "data replication", "data migration", "data integration",
    "api design", "api gateway", "rate limiting", "circuit breakers",
    "blue green deployment", "canary releases", "feature flags",
    "infrastructure as code", "configuration management",
    "secrets management", "identity and access management",
    "role based access control", "row level security",
    "column level security", "data masking", "data anonymization",
    "differential privacy", "privacy by design", "data retention",
    "regulatory reporting", "risk management", "fraud detection",
    "customer segmentation", "churn prediction", "demand forecasting",
    "supply chain analytics", "marketing analytics", "web analytics",
    "product analytics", "funnel analysis", "cohort analysis",
    "attribution modeling", "propensity modeling", "uplift modeling",
]

# ----------------------------------------------------------- NO (bokmål)
# Norwegian-language skill vocabulary — the reference merges a Norwegian
# pattern file for Oslo postings (get_skills.py:12-21). Public domain
# vocabulary: job-ad wording for the same competencies.

NO_TERMS = [
    "maskinlæring", "dyp læring", "kunstig intelligens", "dataanalyse",
    "datavarehus", "datasjø", "datakvalitet", "datastyring",
    "dataplattform", "datamodellering", "databehandling", "datainnsamling",
    "datavisualisering", "datasikkerhet", "personvern", "skyteknologi",
    "skytjenester", "skyplattform", "virksomhetsarkitektur",
    "løsningsarkitektur", "systemarkitektur", "systemutvikling",
    "programvareutvikling", "webutvikling", "apputvikling",
    "frontendutvikling", "backendutvikling", "fullstackutvikling",
    "testautomatisering", "enhetstesting", "integrasjonstesting",
    "ytelsestesting", "sikkerhetstesting", "smidig metodikk",
    "smidig utvikling", "prosjektledelse", "produktledelse",
    "teamledelse", "teknisk ledelse", "kravanalyse", "kravspesifikasjon",
    "forretningsanalyse", "forretningsutvikling", "forretningsinnsikt",
    "beslutningsstøtte", "rapportering", "automatisering",
    "prosessautomatisering", "integrasjoner", "api utvikling",
    "mikrotjenester", "hendelsesdrevet arkitektur", "sanntidsdata",
    "strømmebehandling", "batchprosessering", "datapipeline",
    "dataintegrasjon", "datamigrering", "databaser",
    "relasjonsdatabaser", "grafdatabaser", "søketeknologi",
    "statistikk", "statistisk analyse", "prediktiv analyse",
    "prognosemodeller", "tidsserieanalyse", "anomalideteksjon",
    "anbefalingssystemer", "språkteknologi", "tekstanalyse",
    "bildeanalyse", "talegjenkjenning", "optimalisering",
    "algoritmer", "datastrukturer", "distribuerte systemer",
    "parallellprosessering", "høytilgjengelighet", "skalerbarhet",
    "ytelsesoptimalisering", "feilsøking", "overvåking", "logging",
    "drift", "vedlikehold", "dokumentasjon", "opplæring",
    "veiledning", "kommunikasjon", "samarbeid", "problemløsning",
    "analytisk tenkning", "kritisk tenkning", "nysgjerrighet",
    "selvstendighet", "strukturert arbeid", "norsk", "engelsk",
    "universell utforming", "informasjonssikkerhet", "risikostyring",
    "internkontroll", "offentlig sektor", "helsedata", "finansdata",
    "geodata", "sensordata", "åpne data", "stordata", "datadrevet",
    "innsiktsarbeid", "tjenestedesign", "brukeropplevelse",
    "brukergrensesnitt", "interaksjonsdesign", "digitalisering",
    "digital transformasjon", "endringsledelse", "gevinstrealisering",
    "anskaffelser", "leverandøroppfølging", "avtaleforvaltning",
    "arkitekturprinsipper", "integrasjonsplattform", "meldingskøer",
    "versjonskontroll", "kodegjennomgang", "kontinuerlig integrasjon",
    "kontinuerlig leveranse", "testdrevet utvikling", "parprogrammering",
    "smidige team", "tverrfaglige team", "produktteam",
]

# Suffix families: competency phrasings that appear verbatim in job ads.
EN_SUFFIXES = ("development", "engineering", "architecture",
               "administration", "consulting", "migration", "security",
               "testing", "automation", "integration", "modeling",
               "analytics", "pipelines", "infrastructure")
EN_SUFFIX_BASES = """
data cloud platform software web mobile api database network devops
backend frontend etl ml ai bi warehouse lakehouse streaming batch
analytics reporting dashboard iot blockchain payments search
identity messaging storage compute container serverless
graph vector feature model metadata catalog schema query cluster
workflow
""".split()

VERSIONED = {
    "python": ("2", "3", "3.10", "3.11", "3.12"),
    "java": ("8", "11", "17", "21"),
    "spark": ("2", "3", "4"),
    "angular": ("2", "16"),
    "vue": ("2", "3"),
    "php": ("7", "8"),
    ".net": ("6", "8", "core", "framework"),
    "react": ("18",),
    "node.js": ("18", "20"),
    "postgresql": ("14", "15", "16"),
    "kafka": ("streams", "connect"),
    "kubernetes": ("operators",),
    "terraform": ("cloud", "modules"),
    "airflow": ("2",),
    "dbt": ("core", "cloud"),
    "snowflake": ("streams", "tasks"),
    "excel": ("macros", "pivot tables"),
    "tableau": ("server", "prep"),
    "looker": ("studio", "lookml"),
    "sas": ("viya",),
}

ENTERPRISE = """
sap sap-hana sap-bw s/4hana sap-fiori sap-abap sap-basis salesforce
apex visualforce lightning-web-components dynamics-365 navision
workday servicenow netsuite hubspot marketo pardot eloqua zendesk
intercom shopify magento woocommerce sitecore adobe-experience-manager
drupal wordpress contentful sanity strapi sharepoint onedrive teams
outlook exchange active-directory intune sccm citrix vmware vsphere
hyper-v proxmox openstack mainframe jcl cics ims cobol-ii rpg as/400
mq-series tibco mulesoft boomi webmethods biztalk kofax documentum
filenet alfresco opentext peoplesoft jd-edwards epicor infor lawson
sage xero quickbooks stripe paypal adyen klarna vipps swift-payments
iso-20022 fix-protocol bloomberg-terminal refinitiv murex calypso
""".split()

SECURITY_NET = """
wireshark metasploit burp-suite nessus qualys nmap kali-linux
crowdstrike sentinelone defender carbon-black siem soar edr xdr
splunk-enterprise-security qradar arcsight exabeam snort suricata
zeek yara mitre-att&ck threat-hunting threat-intelligence incident-response
forensics malware-analysis reverse-engineering cryptography pki
zero-trust network-segmentation firewall ids ips waf ddos-protection
bgp ospf mpls sd-wan vpn ipsec vlan subnetting routing switching
cisco juniper fortinet palo-alto checkpoint f5 netscaler meraki
aruba-networks mikrotik pfsense wireguard openvpn radius tacacs
network-automation netconf yang snmp voip sip 5g lte fiber-optics
""".split()

EMBEDDED_OTHER = """
arduino raspberry-pi esp32 stm32 rtos freertos zephyr embedded-c
embedded-linux yocto buildroot device-drivers firmware vhdl verilog
fpga asic microcontrollers can-bus modbus opc-ua mqtt zigbee
bluetooth ble lora nfc rfid plc scada hmi robotics ros autosar
arcgis qgis postgis geopandas gdal leaflet mapbox openlayers
remote-sensing lidar photogrammetry cad autocad solidworks catia
revit bim unity unreal-engine godot opengl vulkan directx webgl
three.js blender maya 3ds-max houdini substance zbrush
powerapps power-platform mendix outsystems appian uipath blue-prism
automation-anywhere zapier ifttt airtable retool budibase n8n
""".split()

ACRONYMS = """
olap oltp kpi okr sla slo sli erp crm cms scm plm hris hcm wms tms
mes edi api sdk ide cli gui ui ux poc mvp b2b b2c saas paas iaas
faas dbaas bpm bpmn uml erd sdlc vcs orm mvc mvvm spa ssr ssg seo
sem cro cdp dmp dsp ssp rtb gtm ga4 etl-tools elt-tools hdfs yarn
mapreduce tez presto-sql ansi-sql nosql newsql htap acid cap-theorem
raft paxos two-phase-commit
""".split()

NO_COMPOUND_BASES = (
    "data", "system", "nettverk", "sikkerhets", "program", "løsnings",
    "tjeneste", "plattform", "applikasjons", "integrasjons", "database",
    "web", "sky", "informasjons", "arkitektur", "test", "drifts",
    "prosjekt", "produkt", "kvalitets", "virksomhets", "forretnings",
    "bruker",
)
NO_COMPOUND_SUFFIXES = (
    "utvikling", "arkitektur", "forvaltning", "analyse", "drift",
    "testing", "rådgivning", "design", "administrasjon", "modellering",
    "overvåking", "strategi", "sikkerhet", "kompetanse", "ledelse",
    "styring", "prosesser", "verktøy",
)

STATS_ANALYTICS_TOOLS = """
spss stata minitab alteryx knime rapidminer h2o dataiku domino
ggplot2 dplyr tidyverse shiny caret tidymodels data.table sparklyr
rmarkdown jupyter jupyterlab zeppelin colab deepnote hex anaconda
conda poetry pipenv virtualenv uv setuptools cython numba statsmodels
scipy sympy networkx igraph prophet pmdarima arch pymc stan
bayesian-inference monte-carlo-simulation bootstrapping hypothesis-testing
regression classification clustering dimensionality-reduction pca
factor-analysis survival-analysis causal-inference econometrics
actuarial-science operations-research linear-programming
mixed-integer-programming gurobi cplex or-tools simulation
discrete-event-simulation agent-based-modeling digital-twins
""".split()

MODERN_AI = """
llama mistral gemini claude copilot ollama vllm lora peft rlhf dpo
quantization distillation tokenization sentencepiece beam-search
diffusion-models multimodal-models vision-transformers clip
speech-to-text text-to-speech ocr named-entity-recognition
sentiment-analysis topic-modeling summarization translation
question-answering semantic-similarity reranking guardrails
agentic-workflows function-calling tool-use mcp model-context-protocol
ai-safety ai-ethics responsible-ai explainable-ai model-cards
data-augmentation synthetic-data active-learning weak-supervision
label-studio snorkel data-annotation crowdsourcing human-in-the-loop
""".split()

WORK_PHRASES = [
    "requirements gathering", "technical documentation", "solution design",
    "cloud migration", "legacy modernization", "platform modernization",
    "system integration", "vendor management", "budget management",
    "resource planning", "roadmap planning", "sprint planning",
    "backlog grooming", "user stories", "acceptance criteria",
    "definition of done", "retrospectives", "daily standups",
    "cross functional collaboration", "remote collaboration",
    "technical presentations", "executive reporting", "okr tracking",
    "process improvement", "continuous improvement", "root cause analysis",
    "incident management", "change management", "release management",
    "configuration management database", "knowledge management",
    "service desk", "customer support", "customer success",
    "pre sales", "post sales", "technical writing", "public speaking",
    "workshop facilitation", "training delivery", "onboarding",
    "recruiting", "interviewing", "performance reviews",
    "salary benchmarking", "team building", "conflict resolution",
    "negotiation", "time management", "prioritization",
    "decision making", "strategic thinking", "innovation",
    "entrepreneurship", "growth hacking", "content marketing",
    "email marketing", "social media marketing", "crm administration",
    "sales operations", "revenue operations", "pricing strategy",
    "market research", "competitive analysis", "user research",
    "usability testing", "accessibility", "wcag", "internationalization",
    "localization", "norwegian", "english", "swedish", "danish",
    "german", "french", "spanish", "finnish", "dutch", "icelandic",
    "polish",
]

MORE_CERTS = [
    "aws certified sysops administrator", "aws certified devops engineer",
    "aws certified machine learning specialty",
    "aws certified security specialty", "aws certified cloud practitioner",
    "azure administrator associate", "azure developer associate",
    "azure ai engineer associate", "azure security engineer associate",
    "azure fundamentals", "google associate cloud engineer",
    "google professional machine learning engineer",
    "google professional cloud developer", "databricks certified associate",
    "confluent certified developer", "elastic certified engineer",
    "mongodb certified developer", "oracle certified professional",
    "microsoft certified trainer", "salesforce certified administrator",
    "salesforce certified developer", "istqb foundation",
    "istqb advanced", "safe agilist", "professional scrum master",
    "certified scrum product owner", "prince2 practitioner",
    "togaf certified", "cisa", "cism", "crisc", "ceh", "oscp",
    "gcih", "gsec", "security plus", "network plus", "ccnp", "ccie",
    "jncia", "vcp", "rhce", "rhcsa", "lfcs", "cka security",
]

CERTS = [
    "aws certified solutions architect", "aws certified data engineer",
    "aws certified developer", "azure data engineer associate",
    "azure solutions architect expert", "google professional data engineer",
    "google professional cloud architect", "databricks certified data engineer",
    "snowflake snowpro", "kubernetes cka", "kubernetes ckad",
    "terraform associate", "scrum master certification",
    "pmp certification", "itil foundation", "cissp", "ccna", "comptia security",
]


# Case-sensitive stratum ({"TEXT": ...} rows): standard acronyms and
# punctuated names that spaCy matches case-sensitively. 52 rows like
# the reference's TEXT stratum; duplicates are kept in the FILE (the
# reference file has a few — e.g. its framework names appear twice)
# and deduped at load time, same as the reference's EntityRuler.
TEXT_SKILLS = [
    ".NET", "3D", "API", "ASP.NET", "ASP.NET", "AVA", "AWX", "C++",
    "C", "COBOL", "C++", "CRM", "C#", "CSS", "DC/OS", ".NET", "ES6",
    "ESPACE", "F#", "FFMPEG", "FOSSA", "GSM", "GTP'", "HAML", "HTML",
    "HTML5", "HTTP", "IFTTT", "IPFS", "JIRA", "JSON", "LXC", "LXD",
    "MATLAB", "MEAN", "NATS", "NSQ", "OVH", "P2P", "PHP", "PHP-MVC",
    "PICO-8", "PWA", "R", "RAML", "RDF", "SMA*", "SQL", "STREAMS",
    "STRIPS", "TRECVID", "XML",
]


def build_phrases() -> list[str]:
    en: list[str] = []
    for group in (LANGUAGES, DATA_TOOLS, ML_AI, DATABASES, CLOUD_DEVOPS,
                  WEB_APP, PRACTICES, ENTERPRISE, SECURITY_NET,
                  EMBEDDED_OTHER, ACRONYMS, STATS_ANALYTICS_TOOLS,
                  MODERN_AI):
        en.extend(group)
    en.extend(EN_EXTRA_MULTIWORD)
    en.extend(WORK_PHRASES)
    en.extend(CERTS)
    en.extend(MORE_CERTS)
    for base in EN_SUFFIX_BASES:
        for suf in EN_SUFFIXES:
            en.append(f"{base} {suf}")
    for base, versions in VERSIONED.items():
        for v in versions:
            en.append(f"{base} {v}")
    # Hyphenated entries in the source lists are word-joined phrases.
    en = [p.replace("-", " ") if "-" in p and p not in ("objective-c",)
          else p for p in en]
    no = list(NO_TERMS)
    for base in NO_COMPOUND_BASES:
        for suf in NO_COMPOUND_SUFFIXES:
            no.append(base + suf)  # Norwegian compounds join closed
    # Merge EN + NO exactly like the reference's get_skills.py builder.
    merged = en + no
    seen: set[str] = set()
    out: list[str] = []
    for p in merged:
        p = " ".join(p.lower().split())
        if p and p not in seen:
            seen.add(p)
            out.append(p)
    # Reference scale: 2,412 rows total = 2,360 LOWER + 52 TEXT
    # (assets/skills_no_en.jsonl stratum sizes).
    return out[:2360]


def main() -> None:
    phrases = build_phrases()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "skill_patterns.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for p in phrases:
            pattern = [{"LOWER": tok} for tok in p.split()]
            f.write(json.dumps({"label": "SKILL", "pattern": pattern},
                               ensure_ascii=False) + "\n")
        for t in TEXT_SKILLS:
            f.write(json.dumps(
                {"label": "SKILL", "pattern": [{"TEXT": t}]},
                ensure_ascii=False) + "\n")
    print(f"wrote {len(phrases)} LOWER + {len(TEXT_SKILLS)} TEXT "
          f"patterns -> {path}")


if __name__ == "__main__":
    main()
